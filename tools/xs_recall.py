"""Quantify the ExactSubstr hot-gram recall contract (round-9 ask #3).

The q_exact_substring_spans pipeline excludes grams occurring more
than _XS_HOT times corpus-wide (bounding pair fan-out at cap^2) and
BRIDGES diagonal-run gaps of <= _XS_K - 1 excluded grams (exact — see
the _XS_HOT note in plans/text_ngram.py). This tool measures, in
DuckDB, the duplicated-token mass each semantics recovers against the
UNCAPPED ground truth (every gram pairs; with no excluded grams the
bridge is inert, so uncapped == the exact suffix-array answer):

  - capped_unbridged : the round-9 semantics (cap, contiguous runs)
  - capped_bridged   : the shipped semantics (cap + gap bridge)
  - uncapped         : ground truth

on three corpora: the sf0.001 and sf0.01 fixtures, and a synthetic
boilerplate-heavy corpus engineered so the cap actually fires (the
fixtures' duplicated spans rarely contain corpus-hot grams):

  - 150 doc pairs sharing a 52-token span with a 12-token boilerplate
    block (shared by all 300 such docs -> its 5 interior grams are
    hot) in the middle: contiguous runs split to 27/19 tokens < L and
    lose the span ENTIRELY; the bridge (gap 5+2=7 <= K) recovers it.
  - 100 doc pairs sharing a clean 40-token span (cap never fires).
  - 50 doc pairs sharing a 60-token span with a 20-token hot block:
    gap 13+2 > K, the bridge must NOT cross -> both flanks < L, lost
    under either capped semantics (the residual contract).
  - 100 singleton filler docs.

Writes the table to BENCH_AB.json under "xs_hot_gram_recall" and
prints it. Usage: python tools/xs_recall.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mapreduce_server_development_spark.plans.text_ngram import (  # noqa: E402
    _XS_HOT,
    _XS_K,
    _XS_L,
)


def span_sql(cap: int | None, bridge: bool) -> str:
    """The _XS_CTES chain, parametrized by cap and bridge.

    Mirrors plans/text_ngram.py exactly for (cap=_XS_HOT,
    bridge=True); cap=None drops the occurrence cap (ground truth).
    Returns total dup tokens / spans / docs-hit over the corpus.
    """
    cap_clause = f"COUNT(*) <= {cap} AND " if cap is not None else ""
    if bridge:
        runs = f"""
    runs AS (
        SELECT da, db, pa - pb AS diag, pa, pb,
               CASE WHEN pa - LAG(pa) OVER (PARTITION BY da, db, pa - pb
                                            ORDER BY pa) <= {_XS_K}
                    THEN 0 ELSE 1 END AS ni
        FROM pairs
    ),
    runs2 AS (
        SELECT da, db, diag, pa, pb,
               SUM(ni) OVER (PARTITION BY da, db, diag ORDER BY pa
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS grp
        FROM runs
    ),
    spans AS (
        SELECT da, db, MIN(pa) AS sa, MIN(pb) AS sb,
               MAX(pa) - MIN(pa) + {_XS_K} AS span_len
        FROM runs2 GROUP BY da, db, diag, grp
        HAVING MAX(pa) - MIN(pa) + {_XS_K} >= {_XS_L}
    )"""
    else:
        runs = f"""
    runs AS (
        SELECT da, db, pa - pb AS diag, pa, pb,
               pa - ROW_NUMBER() OVER (PARTITION BY da, db, pa - pb
                                       ORDER BY pa) AS grp
        FROM pairs
    ),
    spans AS (
        SELECT da, db, MIN(pa) AS sa, MIN(pb) AS sb,
               COUNT(*) + {_XS_K} - 1 AS span_len
        FROM runs GROUP BY da, db, diag, grp
        HAVING COUNT(*) + {_XS_K} - 1 >= {_XS_L}
    )"""
    return f"""
    WITH toks AS (
        SELECT doc_id AS doc,
               list_filter(string_split(lower(text), ' '), t -> t <> '')
                   AS toks
        FROM documents
    ),
    grams AS (
        SELECT doc, u.pos AS pos, substr(md5(u.gram), 1, 16) AS gh
        FROM (
            SELECT doc,
                   unnest(list_transform(
                       range(1, len(toks) - {_XS_K} + 2),
                       i -> {{'pos': i - 1,
                             'gram': array_to_string(toks[i:i+{_XS_K - 1}], ' ')}})) AS u
            FROM toks)
    ),
    keep AS (
        SELECT gh FROM grams GROUP BY gh
        HAVING {cap_clause}MIN(doc) <> MAX(doc)
    ),
    g2 AS (SELECT g.doc, g.pos, g.gh FROM grams g JOIN keep USING (gh)),
    pairs AS (
        SELECT a.doc AS da, a.pos AS pa, b.doc AS db, b.pos AS pb
        FROM g2 a JOIN g2 b USING (gh)
        WHERE a.doc < b.doc
    ),{runs},
    iv AS (
        SELECT DISTINCT doc, s, e FROM (
            SELECT da AS doc, sa AS s, sa + span_len AS e FROM spans
            UNION ALL
            SELECT db AS doc, sb AS s, sb + span_len AS e FROM spans
        )
    ),
    isl AS (
        SELECT doc, s, e,
               CASE WHEN MAX(e) OVER w IS NULL OR s > MAX(e) OVER w
                    THEN 1 ELSE 0 END AS ni
        FROM iv
        WINDOW w AS (PARTITION BY doc ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    isl2 AS (
        SELECT doc, s, e,
               SUM(ni) OVER (PARTITION BY doc ORDER BY s, e
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS island
        FROM isl
    ),
    merged AS (
        SELECT doc, island, MAX(e) - MIN(s) AS cov
        FROM isl2 GROUP BY doc, island
    )
    SELECT COALESCE(SUM(cov), 0) AS dup_tokens,
           COUNT(*) AS n_islands,
           COUNT(DISTINCT doc) AS n_docs_hit
    FROM merged
    """


def measure(con: duckdb.DuckDBPyConnection) -> dict:
    out = {}
    for name, cap, bridge in (
        ("capped_unbridged", _XS_HOT, False),
        ("capped_bridged", _XS_HOT, True),
        ("uncapped", None, False),
    ):
        t0 = time.time()
        dup, n_sp, n_hit = con.sql(span_sql(cap, bridge)).fetchone()
        out[name] = {
            "dup_tokens": int(dup),
            "n_islands": int(n_sp),
            "n_docs_hit": int(n_hit),
            "sec": round(time.time() - t0, 2),
        }
    gt = out["uncapped"]["dup_tokens"]
    for name in ("capped_unbridged", "capped_bridged"):
        out[name]["token_recall"] = (
            round(out[name]["dup_tokens"] / gt, 4) if gt else None
        )
    return out


def synthetic_rows() -> list[tuple[int, str, str]]:
    def u(prefix: str, n: int) -> list[str]:
        return [f"{prefix}_{i}" for i in range(n)]

    BOIL12 = u("boil", 12)   # shared by 300 docs -> 5 interior hot grams
    BOIL20 = u("hot", 20)    # shared by 100 docs -> 13 interior hot grams
    rows: list[tuple[int, str, str]] = []
    did = 0
    for i in range(150):  # bridge-recoverable: 20 + 12 + 20
        span = u(f"p{i}a", 20) + BOIL12 + u(f"p{i}b", 20)
        for j in range(2):
            rows.append((did, " ".join(u(f"x{i}_{j}", 6) + span
                                       + u(f"y{i}_{j}", 6)), "bridged"))
            did += 1
    for i in range(100):  # clean 40-token span
        span = u(f"c{i}", 40)
        for j in range(2):
            rows.append((did, " ".join(u(f"v{i}_{j}", 7) + span
                                       + u(f"w{i}_{j}", 5)), "clean"))
            did += 1
    for i in range(50):  # residual: 20 + 20-hot + 20, gap > K
        span = u(f"r{i}a", 20) + BOIL20 + u(f"r{i}b", 20)
        for j in range(2):
            rows.append((did, " ".join(u(f"q{i}_{j}", 8) + span
                                       + u(f"s{i}_{j}", 4)), "residual"))
            did += 1
    for i in range(100):  # singleton filler
        rows.append((did, " ".join(u(f"f{i}", 50)), "filler"))
        did += 1
    return rows


def main() -> int:
    results: dict = {
        "what": ("r9 verdict ask #3: dup-token recall of the hot-gram cap "
                 "vs the uncapped ground truth, before (capped_unbridged = "
                 "r9 semantics) and after (capped_bridged = shipped) the "
                 "gap bridge; uncapped is exact (with no excluded grams "
                 "the bridge is inert)"),
        "params": {"K": _XS_K, "L": _XS_L, "cap": _XS_HOT},
    }
    for sf in ("0.001", "0.01"):
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT doc_id, text, source "
            f"FROM '/root/testdata/sf{sf}/documents.parquet'"
        )
        results[f"sf{sf}"] = measure(con)
        con.close()
        print(f"sf{sf}: {json.dumps(results[f'sf{sf}'])}", flush=True)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, source VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?)", synthetic_rows()
    )
    results["synthetic_boilerplate"] = measure(con)
    # expected mass for the engineered corpus, for the reader
    results["synthetic_boilerplate"]["expected"] = {
        "uncapped": 300 * 52 + 200 * 40 + 100 * 60,
        "bridged_recovers": 300 * 52,
        "residual_loss": 100 * 60,
    }
    con.close()
    print(
        f"synthetic: {json.dumps(results['synthetic_boilerplate'])}",
        flush=True,
    )

    book_path = REPO / "BENCH_AB.json"
    book = json.loads(book_path.read_text()) if book_path.exists() else {}
    book["xs_hot_gram_recall"] = results
    book_path.write_text(json.dumps(book, indent=1, sort_keys=True) + "\n")
    print("written to BENCH_AB.json xs_hot_gram_recall")
    return 0


if __name__ == "__main__":
    sys.exit(main())
