"""Benchmark harness: time every registered query, emit ONE JSON line.

Runs each query from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints a single JSON line on stdout:

    {"metric": "total_query_seconds", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is driven to completion with a count-style action (foreach
noop) so results are computed but never collected to the driver.
All Spark chatter goes to stderr; the JSON line is the only stdout.

Measurement discipline (round-8 verdict ask #1):
- every query is timed once in the sweep (its COLD, first-invocation
  time, recorded per-query as ``first``);
- anything over 5s is re-run once (transient GC/host-noise floor);
- the 10 slowest get a THIRD run, INTERLEAVED with a fixed control
  query (q1_pricing_summary) whose per-interleave times ride
  BENCH_DETAIL as ``control_runs`` — if the control drifts, the tail
  reruns were taken on a noisy host and round-over-round deltas are
  not attributable to plans;
- the HEADLINE ``queries`` value is the MEDIAN of a query's runs
  (min-of-runs was the old headline; it hid the third run and made
  regressions ambiguous), with ``first``/``min``/``median``/``runs``
  all recorded per-query in BENCH_DETAIL's ``per_query``.

Usage: python bench.py [query ...]   # subset by name, default all
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

CONTROL_QUERY = "q1_pricing_summary"


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


def _median(xs: list[float]) -> float:
    rs = sorted(xs)
    n = len(rs)
    if n % 2:
        return rs[n // 2]
    return round((rs[n // 2 - 1] + rs[n // 2]) / 2, 2)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])

    import __spark_entry__ as entrymod
    from mapreduce_server_development_spark.session import get_spark

    queries = entrymod.queries()
    unknown = only - set(queries)
    if unknown:
        # A typo'd name matching nothing would emit total=0 as a valid
        # benchmark line — fail loudly instead.
        print(f"bench: unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        return 2
    spark = get_spark(app_name="bench")

    def run_once(name: str) -> float | None:
        """One timed evaluation; cache cleared OUTSIDE the timer so
        every run starts from the same cold cache. Returns None on
        failure."""
        t0 = time.time()
        try:
            # foreach forces full evaluation on executors; nothing is
            # shipped to the driver (collect would skew the timing and
            # break at scale).
            queries[name](spark, sf_dir).foreach(lambda _: None)
            t = round(time.time() - t0, 2)
        except Exception as e:  # noqa: BLE001
            print(f"bench: {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
            return None
        spark.catalog.clearCache()
        return t

    # JVM/codegen warmup so the first timed query isn't charged for it.
    # Beyond the generic first-query warmup, exercise the expression
    # chains whole query FAMILIES share — tokenize/shingle/md5 (text
    # dedup) and the array dot product (similarity) — because their
    # interpreted pre-JIT cost otherwise lands on whichever family
    # member happens to run first (measured: the identical batch
    # signature chain runs 5.6s cold vs 0.7s warm; BENCH_AB
    # `q_stream_minhash_dedup_cold_start`).
    warmups = [next(iter(queries))]
    for w in ("q_doc_fingerprint", "q_cosine_topk"):
        if w in queries:
            warmups.append(w)
    for w in warmups:
        try:
            queries[w](spark, sf_dir).foreach(lambda _: None)
        except Exception:  # noqa: BLE001 - warmup is best-effort
            pass
    # Warmup may persist intermediates; the first TIMED query is that
    # same query and would reuse them — clear so query 1 starts from
    # the same cold cache as every other.
    spark.catalog.clearCache()

    runs: dict[str, list[float]] = {}
    failed: list[str] = []
    for name in queries:
        if only and name not in only:
            continue
        t = run_once(name)
        if t is None:
            failed.append(name)
        else:
            runs[name] = [t]

    # Noise control: a single-pass sweep occasionally charges one heavy
    # query a 3-4x transient (GC pause / host noise landing mid-query —
    # observed as a different victim each run). Re-run anything over 5s
    # once — the standard repeated-measurement floor, bounded to the
    # handful of genuinely heavy queries.
    for name, rs in list(runs.items()):
        if rs[0] > 5.0:
            t = run_once(name)
            if t is not None:
                rs.append(t)

    # Tail medians + interleaved control (round-8 verdict ask #1): the
    # 10 slowest queries get a THIRD run, with the fixed control query
    # timed between each, so host noise during the rerun block is
    # visible as control drift rather than silently inflating (or
    # deflating) a tail query's number.
    control_runs: list[float] = []
    tail = sorted(runs, key=lambda n: _median(runs[n]), reverse=True)[:10]
    for name in tail:
        if CONTROL_QUERY in queries and not only:
            c = run_once(CONTROL_QUERY)
            if c is not None:
                control_runs.append(c)
        while len(runs[name]) < 3:
            t = run_once(name)
            if t is None:
                break
            runs[name].append(t)

    # Headline per-query seconds: median of runs (1, 2, or 3 runs).
    timings = {n: _median(rs) for n, rs in runs.items()}
    for n in failed:
        timings[n] = -1.0
    per_query = {
        n: {
            "first": rs[0],
            "min": min(rs),
            "median": _median(rs),
            "runs": rs,
        }
        for n, rs in runs.items()
    }
    tail_medians = {
        n: {
            "runs": runs[n],
            "median": _median(runs[n]),
            "spread": round(max(runs[n]) - min(runs[n]), 2),
        }
        for n in tail
    }

    total = round(sum(t for t in timings.values() if t >= 0), 2)
    sf = _sf_of(sf_dir)
    compact = {"separators": (",", ":")}
    detail = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "headline": "median_of_runs",
        "queries": timings,
        "per_query": per_query,
        "tail_medians": tail_medians,
        "control_query": CONTROL_QUERY,
        "control_runs": control_runs,
        "control_spread": (
            round(max(control_runs) - min(control_runs), 2)
            if control_runs
            else None
        ),
        "n_failed": len(failed),
        "failed": sorted(failed),
        "sf": sf,
    }
    # Solo-rerun A/B book (tools/regression_ab.py) — embedded so the
    # per-round BENCH_DETAIL snapshot carries the triage evidence.
    ab_path = REPO / "BENCH_AB.json"
    if ab_path.exists():
        try:
            detail["regression_ab"] = json.loads(ab_path.read_text())
        except ValueError:
            pass
    # Full per-query detail: one compact line (may exceed the driver's
    # stdout-tail capture) plus a file copy that always survives.
    # Subset runs (triage) must NOT clobber the full-sweep snapshot the
    # round records depend on.
    if not only:
        (REPO / "BENCH_DETAIL.json").write_text(
            json.dumps(detail, **compact) + "\n"
        )
    print(json.dumps(detail, **compact))
    # Final SHORT summary line: the driver captures only the last ~2000
    # chars of stdout, so the parseable line must come last and stay
    # small — top-20 slowest queries only, full detail in the file above.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:20]
    )
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "headline": "median_of_runs",
                "queries": slowest,
                "n_queries": len(timings),
                # A broken query must never read as a perf win: its -1
                # sentinel drops out of the total, so the failure list
                # rides the driver-visible summary line explicitly.
                "n_failed": len(failed),
                "failed": sorted(failed),
                "control_spread": detail["control_spread"],
                "queries_detail": "BENCH_DETAIL.json",
                "sf": sf,
            },
            **compact,
        )
    )
    sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
