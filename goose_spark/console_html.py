"""Console HTML layer — the view half of the reference's web console.

The reference renders hiccup vectors through a shared layout
(``src/goose/console.clj:273-291`` app-handler + per-page views under
``src/goose/brokers/redis/console/pages/``); this module is the same
split on top of the JSON data layer in :mod:`goose_spark.console`: a
hiccup-style renderer (nested lists → escaped HTML), page views for
home / enqueued / scheduled / dead / cron / batch, and a framework-free
``app_handler(path, params) -> (status, content_type, body)`` router any
HTTP server can mount (stdlib ``http.server`` included — no web
framework in the container).

Everything here is driver-side presentation over already-bounded data
pages (the data layer caps rows at PAGE_SIZE/limit), so there is no
scale surface: the cluster work happened in the data layer's pruned,
limit-pushed state queries.
"""

from __future__ import annotations

from html import escape
from typing import Iterable

from goose_spark.console import Console

NAV = (
    ("Home", "/"),
    ("Enqueued", "/enqueued"),
    ("Scheduled", "/scheduled"),
    ("Dead", "/dead"),
    ("Cron", "/cron"),
    ("Workers", "/workers"),
)


# ---------------------------------------------------------------------------
# hiccup-style renderer
# ---------------------------------------------------------------------------

def h(node) -> str:
    """Render a hiccup-style node: ``["tag.cls#id", {attrs}, child, ...]``.
    Strings are escaped; nested lists recurse; ``None`` children vanish.
    The reference's views are hiccup vectors (pages/home.clj:7-25) — this
    keeps the same declarative page shape in Python lists."""
    if node is None:
        return ""
    if isinstance(node, str):
        return escape(node)
    if not isinstance(node, (list, tuple)):
        return escape(str(node))
    tag, rest = node[0], list(node[1:])
    attrs = {}
    if rest and isinstance(rest[0], dict):
        attrs = rest.pop(0)
    name = tag
    classes: list[str] = []
    if "#" in name:
        name, _, el_id = name.partition("#")
        attrs.setdefault("id", el_id)
    if "." in name:
        name, *classes = name.split(".")
    if classes:
        attrs["class"] = " ".join(classes + attrs.get("class", "").split())
    attr_s = "".join(
        f' {escape(k)}="{escape(str(v), quote=True)}"' for k, v in attrs.items() if v is not None
    )
    inner = "".join(h(c) for c in rest)
    return f"<{name}{attr_s}>{inner}</{name}>"


def layout(title: str, body) -> str:
    """Shared chrome (console.clj layout + pages/components.clj header):
    nav header + page body."""
    nav = ["nav", *[["a", {"href": href}, label] for label, href in NAV]]
    return "<!DOCTYPE html>" + h(
        ["html",
         ["head", ["title", f"goose-spark console — {title}"]],
         ["body", ["header", ["h1", "goose-spark"], nav], ["main#page", body]]]
    )


def _jobs_table(jobs: Iterable[dict], cols: tuple[str, ...]) -> list:
    """jobs-table (pages/enqueued.clj:24-51): header + one row per job,
    id rendered as a drill-down link."""
    head = ["tr", *[["th", c] for c in cols]]
    rows = [
        ["tr",
         *[["td", ["a", {"href": f"/job/{j['id']}", "class": "underline"}, str(j["id"])]]
           if c == "id" else ["td", "" if j.get(c) is None else str(j.get(c))]
           for c in cols]]
        for j in jobs
    ]
    return ["table.jobs-table", ["thead", head], ["tbody", *rows]]


# ---------------------------------------------------------------------------
# page views (one per reference console page)
# ---------------------------------------------------------------------------

class ConsoleHtml:
    def __init__(self, console: Console):
        self.console = console

    def home(self) -> str:
        d = self.console.page_home()
        stats = ["section.statistics",
                 *[["div.stat", {"id": k},
                    ["span.number", str(d[k])],
                    ["a", {"href": route}, ["span.label", label]]]
                   for k, label, route in (
                       ("enqueued", "Enqueued", "/enqueued"),
                       ("scheduled", "Scheduled", "/scheduled"),
                       ("cron", "Cron", "/cron"),
                       ("dead", "Dead", "/dead"),
                       ("workers", "Workers", "/workers"),
                   )]]
        return layout("Home", stats)

    def enqueued(self, queue: str | None = None, page=1) -> str:
        if queue is None:
            queues = self.console.api.list_queues()
            body = ["ul.queues",
                    *[["li", ["a", {"href": f"/enqueued/queue/{q}"}, q]] for q in queues]]
            return layout("Enqueued", body)
        d = self.console.page_enqueued(queue, page=page)
        body = ["div",
                ["h2", f"Queue: {queue} ({d['total']} jobs)"],
                _jobs_table(d["jobs"], ("id", "execute_fn", "args", "enqueued_at"))]
        return layout(f"Enqueued — {queue}", body)

    def scheduled(self, page=1) -> str:
        d = self.console.page_scheduled(page=page)
        body = ["div", ["h2", f"Scheduled ({d['total']})"],
                _jobs_table(d["jobs"], ("id", "execute_fn", "status", "run_at"))]
        return layout("Scheduled", body)

    def dead(self, page=1) -> str:
        d = self.console.page_dead(page=page)
        body = ["div", ["h2", f"Dead ({d['total']})"],
                _jobs_table(d["jobs"], ("id", "execute_fn", "error", "died_at"))]
        return layout("Dead", body)

    def cron(self) -> str:
        d = self.console.page_cron()
        head = ["tr", *[["th", c] for c in ("cron_name", "cron_schedule", "next_run_at")]]
        rows = [["tr", *[["td", str(e.get(c))] for c in ("cron_name", "cron_schedule", "next_run_at")]]
                for e in d["entries"]]
        return layout("Cron", ["table.cron-table", ["thead", head], ["tbody", *rows]])

    def workers(self) -> str:
        ws = self.console.api.workers()
        head = ["tr", *[["th", c] for c in ("worker_id", "registered_at", "last_beat_at", "alive")]]
        rows = [["tr", *[["td", str(w[c])] for c in ("worker_id", "registered_at", "last_beat_at", "alive")]]
                for w in ws]
        return layout("Workers", ["table.workers-table", ["thead", head], ["tbody", *rows]])

    def job(self, job_id: str) -> str:
        j = self.console.api.find_by_id(job_id)
        if j is None:
            return layout("Job", ["div.not-found", f"No job {job_id}"])
        rows = [["tr", ["th", k], ["td", "" if v is None else str(v)]] for k, v in j.items()]
        return layout(f"Job {job_id}", ["table.job-detail", ["tbody", *rows]])

    def batch(self, batch_id: str) -> str:
        d = self.console.page_batch(batch_id)
        if d is None:
            return layout("Batch", ["div.not-found", f"No batch {batch_id}"])
        rows = [["tr", ["th", s], ["td", str(n)]] for s, n in sorted(d["counts"].items())]
        body = ["div", ["h2", f"Batch {batch_id} — {d['status']}"],
                ["table.batch-counts", ["tbody", *rows]]]
        return layout(f"Batch {batch_id}", body)

    # -- router (app-handler analog, console.clj:273-291) ------------------

    def app_handler(self, path: str, params: dict | None = None):
        """Route a GET path to a rendered page. Returns
        ``(status, content_type, body)``; unknown paths 404."""
        params = params or {}
        parts = [p for p in path.split("/") if p]
        try:
            if not parts:
                return 200, "text/html", self.home()
            if parts[0] == "enqueued":
                if len(parts) == 3 and parts[1] == "queue":
                    return 200, "text/html", self.enqueued(parts[2], page=params.get("page", 1))
                return 200, "text/html", self.enqueued()
            if parts[0] == "scheduled":
                return 200, "text/html", self.scheduled(page=params.get("page", 1))
            if parts[0] == "dead":
                return 200, "text/html", self.dead(page=params.get("page", 1))
            if parts[0] == "cron":
                return 200, "text/html", self.cron()
            if parts[0] == "workers":
                return 200, "text/html", self.workers()
            if parts[0] == "job" and len(parts) == 2:
                return 200, "text/html", self.job(parts[1])
            if parts[0] == "batch" and len(parts) == 2:
                return 200, "text/html", self.batch(parts[1])
        except ValueError as exc:  # bad params (specs.clj validation)
            return 400, "text/plain", str(exc)
        return 404, "text/plain", f"no route: {path}"

    def action_handler(self, path: str, params: dict | None = None):
        """POST actions — the console's form buttons (pages/enqueued.clj
        jobs-table form + components.clj prioritise/delete/replay btns).
        ``ids`` is a comma-separated job-id list. Returns
        ``(status, content_type, body)`` with a plain-text result."""
        params = params or {}
        ids = [i for i in params.get("ids", "").split(",") if i]
        parts = [p for p in path.split("/") if p]
        api = self.console.api
        try:
            if parts[:1] == ["enqueued"] and parts[-1:] == ["jobs"]:
                action = params.get("action", "")
                if action == "prioritise":
                    return 200, "text/plain", f"prioritised {api.prioritise_execution(ids)}"
                if action == "delete":
                    return 200, "text/plain", f"deleted {api.delete_jobs(ids)}"
                return 400, "text/plain", f"unknown action: {action}"
            if parts[:1] == ["enqueued"] and parts[-1:] == ["purge"] and len(parts) == 4:
                return 200, "text/plain", f"purged {api.purge(parts[2])}"
            if parts == ["dead", "jobs"]:
                action = params.get("action", "")
                if action == "replay":
                    return 200, "text/plain", f"replayed {api.replay_dead(int(params.get('n', 1)))}"
                if action == "delete":
                    return 200, "text/plain", f"deleted {api.delete_jobs(ids)}"
                if action == "purge":
                    return 200, "text/plain", f"purged {api.purge_dead()}"
                return 400, "text/plain", f"unknown action: {action}"
            if parts == ["scheduled", "jobs"]:
                action = params.get("action", "")
                if action == "prioritise":
                    return 200, "text/plain", f"prioritised {api.prioritise_execution(ids)}"
                if action == "delete":
                    return 200, "text/plain", f"deleted {api.delete_jobs(ids)}"
                if action == "purge":
                    return 200, "text/plain", f"purged {api.purge_scheduled()}"
                return 400, "text/plain", f"unknown action: {action}"
            if parts == ["cron", "delete"]:
                name = params.get("name", "")
                if api.cron_delete(name):
                    return 200, "text/plain", f"cron deleted: {name}"
                return 404, "text/plain", f"no cron: {name}"
        except ValueError as exc:
            return 400, "text/plain", str(exc)
        return 404, "text/plain", f"no action route: {path}"


def serve(console: Console, port: int = 8080):
    """Mount the console on stdlib http.server (the Ring-adapter analog).
    Returns the server; call ``.serve_forever()`` (blocking) or drive it
    from a thread. Kept framework-free for the sandbox."""
    import http.server
    import urllib.parse

    html = ConsoleHtml(console)

    class Handler(http.server.BaseHTTPRequestHandler):
        def _respond(self, status, ctype, body):
            data = body.encode()
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):  # noqa: N802 (stdlib casing)
            url = urllib.parse.urlparse(self.path)
            params = {k: v[0] for k, v in urllib.parse.parse_qs(url.query).items()}
            self._respond(*html.app_handler(url.path, params))

        def do_POST(self):  # noqa: N802
            url = urllib.parse.urlparse(self.path)
            length = int(self.headers.get("Content-Length", 0))
            form = urllib.parse.parse_qs(self.rfile.read(length).decode())
            params = {k: v[0] for k, v in form.items()}
            self._respond(*html.action_handler(url.path, params))

        def log_message(self, *a):  # quiet test runs
            pass

    return http.server.ThreadingHTTPServer(("127.0.0.1", port), Handler)
