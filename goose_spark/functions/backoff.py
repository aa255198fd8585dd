"""Retry backoff — parity with goose's exponential backoff.

Reference (``src/goose/retry.clj:22-27``)::

    (defn default-retry-delay-sec [retry-count]
      (let [rand-jitter (rand-int 20)]
        (+ 20 (* rand-jitter (inc retry-count)) (reduce * (repeat 4 retry-count)))))

i.e. ``20 + rand(0..19)·(n+1) + n⁴`` seconds for the n-th retry.
The jitter source is injectable so scenario tests are deterministic.
"""

from __future__ import annotations

import random
from typing import Callable


def default_retry_delay_sec(retry_count: int, rand_int: Callable[[int], int] | None = None) -> int:
    rand = rand_int or (lambda n: random.randrange(n))
    return 20 + rand(20) * (retry_count + 1) + retry_count**4


def max_retries_exceeded(retry_count: int, max_retries: int) -> bool:
    """Bury predicate — parity with ``src/goose/retry.clj:29-32``:
    a job dies when retry-count reaches max-retries, i.e. it executes at
    most ``max_retries + 1`` times."""
    return retry_count >= max_retries
