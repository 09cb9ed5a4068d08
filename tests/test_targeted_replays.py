"""Pure-Python replays of relational-plane queries (r10 verdict ask
#3: shrink the blanket-only verification set).

Each test recomputes a registered query's full result from the
sf0.001 parquet fixture with plain Python (pyarrow load, Decimal
exact sums, hand-rolled joins/windows) and asserts row-level equality
with the Spark output — a third, engine-free implementation of the
semantics, independent of both Catalyst and DuckDB. Decimal
arithmetic mirrors the engines' DECIMAL(16,4) discipline (exact,
order-free); doubles are compared bit-tight (rel 1e-12) because the
replay performs the same correctly-rounded operations.
"""

from __future__ import annotations

import json
import math
from collections import defaultdict
from datetime import datetime
from decimal import ROUND_HALF_UP, Decimal
from functools import lru_cache

import pyarrow.parquet as pq

from .conftest import SF_SMOKE

D0001 = Decimal("0.0001")


def dec4(x) -> Decimal:
    """double -> DECIMAL(16,4), the engines' cast (half-up)."""
    return Decimal(str(x)).quantize(D0001, rounding=ROUND_HALF_UP)


def rnd(x: float, n: int) -> float:
    """Half-up rounding (Spark's F.round / DuckDB round), not
    Python's banker's round."""
    q = Decimal(1).scaleb(-n)
    return float(Decimal(str(x)).quantize(q, rounding=ROUND_HALF_UP))


@lru_cache(maxsize=None)
def tbl(name: str):
    return tuple(
        tuple(sorted(r.items()))
        for r in pq.read_table(f"{SF_SMOKE}/{name}.parquet").to_pylist()
    )


def rows(name: str) -> list[dict]:
    return [dict(r) for r in tbl(name)]


def _key(v):
    if v is None:
        return (0,)
    if isinstance(v, bool):
        return (1, v)
    if isinstance(v, (int, float, Decimal)):
        return (2, float(v))
    return (3, str(v))


def _sorted(rows_, cols):
    return sorted(rows_, key=lambda r: tuple(_key(r[c]) for c in cols))


def assert_equal(spark, name: str, replay: list[dict]) -> None:
    """Spark result == replay, order-free, floats compared tight."""
    from mapreduce_server_development_spark.plans import QUERIES

    got = [r.asDict() for r in QUERIES[name](spark, SF_SMOKE).collect()]
    assert len(got) == len(replay), (name, len(got), len(replay))
    if not got:
        return
    cols = sorted(got[0])
    assert {c for c in cols} == set(replay[0]), (name, cols, sorted(replay[0]))
    for g, w in zip(_sorted(got, cols), _sorted(replay, cols)):
        for c in cols:
            gv, wv = g[c], w[c]
            if isinstance(gv, float) and isinstance(wv, (int, float)):
                assert math.isclose(gv, wv, rel_tol=1e-12, abs_tol=1e-12), (
                    name, c, g, w)
            else:
                assert gv == wv, (name, c, g, w)


def ext_disc(li: dict) -> Decimal:
    return dec4(li["l_extendedprice"]) * (Decimal(1) - dec4(li["l_discount"]))


# ---------------------------------------------------------------------------
# TPC-H plans
# ---------------------------------------------------------------------------


def test_replay_q3_shipping_priority(spark):
    cutoff = datetime(1998, 3, 15)
    cust = {c["c_custkey"] for c in rows("customer")
            if c["c_mktsegment"] == "BUILDING"}
    orders = {o["o_orderkey"]: o for o in rows("orders")
              if o["o_custkey"] in cust and o["o_orderdate"] < cutoff}
    acc: dict = defaultdict(Decimal)
    for li in rows("lineitem"):
        o = orders.get(li["l_orderkey"])
        if o and li["l_shipdate"] > cutoff:
            acc[(li["l_orderkey"], o["o_orderdate"])] += ext_disc(li)
    out = [
        {"l_orderkey": k, "revenue": float(v),
         "orderdate": d.strftime("%Y-%m-%d")}
        for (k, d), v in acc.items()
    ]
    out.sort(key=lambda r: (-r["revenue"], r["l_orderkey"]))
    assert_equal(spark, "q3_shipping_priority", out[:10])


def test_replay_q4_order_priority(spark):
    lines = defaultdict(list)
    for li in rows("lineitem"):
        lines[li["l_orderkey"]].append(li["l_shipdate"])
    cnt: dict = defaultdict(int)
    for o in rows("orders"):
        if (datetime(1996, 1, 1) <= o["o_orderdate"] < datetime(1996, 7, 1)
                and any(s > o["o_orderdate"]
                        for s in lines.get(o["o_orderkey"], ()))):
            cnt[o["o_orderpriority"]] += 1
    assert_equal(spark, "q4_order_priority", [
        {"o_orderpriority": k, "order_count": v} for k, v in cnt.items()
    ])


def test_replay_q6_forecast_revenue(spark):
    tot, n = Decimal(0), 0
    for li in rows("lineitem"):
        if (datetime(1996, 1, 1) <= li["l_shipdate"] < datetime(1997, 1, 1)
                and 0.03 <= li["l_discount"] <= 0.07
                and li["l_quantity"] < 24):
            tot += dec4(li["l_extendedprice"]) * dec4(li["l_discount"])
            n += 1
    assert_equal(spark, "q6_forecast_revenue",
                 [{"revenue": float(tot), "n_items": n}])


def test_replay_q10_returned_items(spark):
    nat = {n["n_nationkey"]: n["n_name"] for n in rows("nation")}
    cust = {c["c_custkey"]: c for c in rows("customer")}
    orders = {o["o_orderkey"]: o["o_custkey"] for o in rows("orders")}
    acc: dict = defaultdict(Decimal)
    for li in rows("lineitem"):
        if li["l_returnflag"] != "R":
            continue
        ck = orders.get(li["l_orderkey"])
        if ck is None or ck not in cust:
            continue
        c = cust[ck]
        acc[(ck, c["c_name"], nat[c["c_nationkey"]])] += ext_disc(li)
    out = [
        {"c_custkey": k[0], "c_name": k[1], "n_name": k[2],
         "revenue": float(v)}
        for k, v in acc.items()
    ]
    out.sort(key=lambda r: (-r["revenue"], r["c_custkey"]))
    assert_equal(spark, "q10_returned_items", out[:20])


def test_replay_q12_priority_by_status(spark):
    pri = {o["o_orderkey"]: o["o_orderpriority"] for o in rows("orders")}
    hi: dict = defaultdict(int)
    lo: dict = defaultdict(int)
    for li in rows("lineitem"):
        if not (datetime(1996, 1, 1) <= li["l_shipdate"]
                < datetime(1997, 1, 1)):
            continue
        p = pri.get(li["l_orderkey"])
        if p is None:
            continue
        if p in ("1-URGENT", "2-HIGH"):
            hi[li["l_linestatus"]] += 1
        else:
            lo[li["l_linestatus"]] += 1
    keys = set(hi) | set(lo)
    assert_equal(spark, "q12_priority_by_status", [
        {"l_linestatus": k, "high_line_count": hi[k], "low_line_count": lo[k]}
        for k in keys
    ])


def test_replay_q13_order_distribution(spark):
    per_cust: dict = {c["c_custkey"]: 0 for c in rows("customer")}
    for o in rows("orders"):
        if o["o_orderpriority"] != "1-URGENT" and o["o_custkey"] in per_cust:
            per_cust[o["o_custkey"]] += 1
    dist: dict = defaultdict(int)
    for v in per_cust.values():
        dist[v] += 1
    assert_equal(spark, "q13_order_distribution", [
        {"c_count": k, "custdist": v} for k, v in dist.items()
    ])


def test_replay_q14_promo_revenue(spark):
    ptype = {p["p_partkey"]: p["p_type"] for p in rows("part")}
    promo, total = Decimal(0), Decimal(0)
    for li in rows("lineitem"):
        if not (datetime(1996, 1, 1) <= li["l_shipdate"]
                < datetime(1996, 2, 1)):
            continue
        t = ptype.get(li["l_partkey"])
        if t is None:
            continue
        v = ext_disc(li)
        total += v
        if t == "PROMO":
            promo += v
    assert_equal(spark, "q14_promo_revenue", [
        {"promo_revenue_pct": 100.0 * float(promo) / float(total)}
    ])


def test_replay_q15_top_supplier(spark):
    rev: dict = defaultdict(Decimal)
    for li in rows("lineitem"):
        if datetime(1996, 1, 1) <= li["l_shipdate"] < datetime(1996, 4, 1):
            rev[li["l_suppkey"]] += ext_disc(li)
    mx = max(rev.values())
    out = [
        {"s_suppkey": s["s_suppkey"], "s_name": s["s_name"],
         "total_revenue": float(rev[s["s_suppkey"]])}
        for s in rows("supplier")
        if rev.get(s["s_suppkey"]) == mx
    ]
    assert_equal(spark, "q15_top_supplier", out)


def test_replay_q18_large_orders(spark):
    qty: dict = defaultdict(Decimal)
    for li in rows("lineitem"):
        qty[li["l_orderkey"]] += dec4(li["l_quantity"])
    cname = {c["c_custkey"]: c["c_name"] for c in rows("customer")}
    out = []
    for o in rows("orders"):
        q = qty.get(o["o_orderkey"], Decimal(0))
        if q > 300 and o["o_orderkey"] in qty:
            out.append({
                "c_name": cname[o["o_custkey"]],
                "o_orderkey": o["o_orderkey"],
                "orderdate": o["o_orderdate"].strftime("%Y-%m-%d"),
                "o_totalprice": o["o_totalprice"],
                "total_qty": float(q),
            })
    assert_equal(spark, "q18_large_orders", out)


def test_replay_q19_disjunctive_join(spark):
    part = {p["p_partkey"]: p for p in rows("part")}
    tot, n = Decimal(0), 0
    for li in rows("lineitem"):
        p = part.get(li["l_partkey"])
        if p is None:
            continue
        q = li["l_quantity"]
        hit = (
            (p["p_brand"] == "Brand#1" and 1 <= p["p_size"] <= 15
             and 1 <= q <= 25)
            or (p["p_brand"] == "Brand#2" and 10 <= p["p_size"] <= 30
                and 10 <= q <= 40)
            or (p["p_type"] == "PROMO" and 1 <= p["p_size"] <= 20
                and 20 <= q <= 50)
        )
        if hit:
            tot += ext_disc(li)
            n += 1
    assert_equal(spark, "q19_disjunctive_join",
                 [{"revenue": float(tot), "n_lines": n}])


def test_replay_q8_market_share(spark):
    nat = {n["n_nationkey"]: n for n in rows("nation")}
    reg = {r["r_regionkey"]: r["r_name"] for r in rows("region")}
    part = {p["p_partkey"]: p["p_type"] for p in rows("part")}
    cust = {c["c_custkey"]: c["c_nationkey"] for c in rows("customer")}
    supp = {s["s_suppkey"]: s["s_nationkey"] for s in rows("supplier")}
    orders = {o["o_orderkey"]: o for o in rows("orders")}
    num: dict = defaultdict(Decimal)
    den: dict = defaultdict(Decimal)
    for li in rows("lineitem"):
        if part.get(li["l_partkey"]) != "ECONOMY":
            continue
        o = orders.get(li["l_orderkey"])
        if o is None or not (datetime(1996, 1, 1) <= o["o_orderdate"]
                             < datetime(1998, 1, 1)):
            continue
        cn = nat[cust[o["o_custkey"]]]
        if reg[cn["n_regionkey"]] != "ASIA":
            continue
        sn = nat[supp[li["l_suppkey"]]]["n_name"]
        v = ext_disc(li)
        y = o["o_orderdate"].year
        den[y] += v
        if sn == "NATION_2":
            num[y] += v
    assert_equal(spark, "q8_market_share", [
        {"o_year": y, "mkt_share": float(num[y]) / float(den[y])}
        for y in den
    ])


def test_replay_q9_product_profit(spark):
    nat = {n["n_nationkey"]: n["n_name"] for n in rows("nation")}
    part = {p["p_partkey"]: p for p in rows("part")}
    supp = {s["s_suppkey"]: s["s_nationkey"] for s in rows("supplier")}
    acc: dict = defaultdict(Decimal)
    for li in rows("lineitem"):
        p = part.get(li["l_partkey"])
        if p is None or "widget" not in p["p_name"]:
            continue
        profit = (ext_disc(li)
                  - dec4(p["p_retailprice"]) * dec4(li["l_quantity"]))
        acc[(nat[supp[li["l_suppkey"]]], li["l_shipdate"].year)] += profit
    assert_equal(spark, "q9_product_profit", [
        {"nation": k[0], "o_year": k[1], "sum_profit": float(v)}
        for k, v in acc.items()
    ])


def test_replay_q16_supplier_count(spark):
    bad = {s["s_suppkey"] for s in rows("supplier") if s["s_acctbal"] < 1000}
    part = {p["p_partkey"]: p for p in rows("part")}
    sizes = {1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49}
    supps: dict = defaultdict(set)
    for li in rows("lineitem"):
        p = part.get(li["l_partkey"])
        if (p is None or p["p_brand"] == "Brand#1" or p["p_type"] == "PROMO"
                or p["p_size"] not in sizes or li["l_suppkey"] in bad):
            continue
        supps[(p["p_brand"], p["p_type"], p["p_size"])].add(li["l_suppkey"])
    assert_equal(spark, "q16_supplier_count", [
        {"p_brand": k[0], "p_type": k[1], "p_size": k[2],
         "supplier_cnt": len(v)}
        for k, v in supps.items()
    ])


def test_replay_q20_qty_threshold_suppliers(spark):
    part = {p["p_partkey"]: p for p in rows("part")}
    ps: dict = defaultdict(Decimal)
    for li in rows("lineitem"):
        p = part.get(li["l_partkey"])
        if (p is None or not p["p_name"].startswith("small")
                or not (datetime(1997, 1, 1) <= li["l_shipdate"]
                        < datetime(1998, 1, 1))):
            continue
        ps[(li["l_partkey"], li["l_suppkey"])] += dec4(li["l_quantity"])
    pt: dict = defaultdict(Decimal)
    for (pk, _), q in ps.items():
        pt[pk] += q
    nat = {n["n_nationkey"]: n["n_name"] for n in rows("nation")}
    supp = {s["s_suppkey"]: s for s in rows("supplier")}
    out = {
        (sk, supp[sk]["s_name"], nat[supp[sk]["s_nationkey"]])
        for (pk, sk), q in ps.items()
        if float(q) > 0.3 * float(pt[pk])
    }
    assert_equal(spark, "q20_qty_threshold_suppliers", [
        {"suppkey": k[0], "supp_name": k[1], "nation": k[2]} for k in out
    ])


# ---------------------------------------------------------------------------
# Join / aggregate / set / scalar plans
# ---------------------------------------------------------------------------


def test_replay_q_distinct_agg(spark):
    parts: dict = defaultdict(set)
    supps: dict = defaultdict(set)
    n: dict = defaultdict(int)
    for li in rows("lineitem"):
        f = li["l_returnflag"]
        parts[f].add(li["l_partkey"])
        supps[f].add(li["l_suppkey"])
        n[f] += 1
    assert_equal(spark, "q_distinct_agg", [
        {"l_returnflag": f, "distinct_parts": len(parts[f]),
         "distinct_supps": len(supps[f]), "n_rows": n[f]}
        for f in n
    ])


def test_replay_q_rollup(spark):
    acc: dict = defaultdict(lambda: [Decimal(0), 0])
    for li in rows("lineitem"):
        for key in (
            (li["l_returnflag"], li["l_linestatus"]),
            (li["l_returnflag"], None),
            (None, None),
        ):
            a = acc[key]
            a[0] += dec4(li["l_quantity"])
            a[1] += 1
    assert_equal(spark, "q_rollup", [
        {"l_returnflag": k[0], "l_linestatus": k[1],
         "sum_qty": float(v[0]), "n": v[1]}
        for k, v in acc.items()
    ])


def test_replay_q_cube(spark):
    acc: dict = defaultdict(lambda: [Decimal(0), 0])
    for o in rows("orders"):
        for key in (
            (o["o_orderstatus"], o["o_orderpriority"]),
            (o["o_orderstatus"], None),
            (None, o["o_orderpriority"]),
            (None, None),
        ):
            a = acc[key]
            a[0] += dec4(o["o_totalprice"])
            a[1] += 1
    assert_equal(spark, "q_cube", [
        {"o_orderstatus": k[0], "o_orderpriority": k[1],
         "total": float(v[0]), "n": v[1]}
        for k, v in acc.items()
    ])


def test_replay_q_grouping_sets(spark):
    acc: dict = defaultdict(lambda: [Decimal(0), 0])
    for li in rows("lineitem"):
        for key in (
            (li["l_returnflag"], li["l_linestatus"], 0, 0),
            (None, li["l_linestatus"], 1, 0),
            (None, None, 1, 1),
        ):
            a = acc[key]
            a[0] += dec4(li["l_quantity"])
            a[1] += 1
    assert_equal(spark, "q_grouping_sets", [
        {"l_returnflag": k[0], "l_linestatus": k[1], "g_flag": k[2],
         "g_status": k[3], "sum_qty": float(v[0]), "n": v[1]}
        for k, v in acc.items()
    ])


def test_replay_q_case_agg(spark):
    acc: dict = defaultdict(lambda: [0, 0, Decimal(0)])
    for o in rows("orders"):
        a = acc[o["o_orderpriority"]]
        if o["o_totalprice"] > 200000:
            a[0] += 1
        else:
            a[1] += 1
        if o["o_orderstatus"] == "F":
            a[2] += dec4(o["o_totalprice"])
    assert_equal(spark, "q_case_agg", [
        {"o_orderpriority": k, "big_orders": v[0], "small_orders": v[1],
         "finished_value": float(v[2])}
        for k, v in acc.items()
    ])


def test_replay_q_pivot(spark):
    acc: dict = defaultdict(lambda: {"F": 0, "O": 0, "P": 0})
    for o in rows("orders"):
        acc[o["o_orderpriority"]][o["o_orderstatus"]] += 1
    assert_equal(spark, "q_pivot", [
        {"o_orderpriority": k, "f": v["F"], "o": v["O"], "p": v["P"]}
        for k, v in acc.items()
    ])


def _quantile_cont(sorted_vals: list[float], q: float) -> float:
    n = len(sorted_vals)
    pos = (n - 1) * q
    lo = math.floor(pos)
    hi = math.ceil(pos)
    if lo == hi:
        return sorted_vals[lo]
    return (sorted_vals[lo] * (hi - pos) + sorted_vals[hi] * (pos - lo))


def test_replay_q_percentiles(spark):
    qty: dict = defaultdict(list)
    price: dict = defaultdict(list)
    for li in rows("lineitem"):
        qty[li["l_returnflag"]].append(li["l_quantity"])
        price[li["l_returnflag"]].append(li["l_extendedprice"])
    out = []
    for f in qty:
        qs, ps = sorted(qty[f]), sorted(price[f])
        out.append({
            "l_returnflag": f,
            "median_qty": rnd(_quantile_cont(qs, 0.5), 4),
            "p90_qty": rnd(_quantile_cont(qs, 0.9), 4),
            "median_price": rnd(_quantile_cont(ps, 0.5), 4),
        })
    assert_equal(spark, "q_percentiles", out)


def test_replay_q_unpivot(spark):
    out = []
    for p in rows("part"):
        out.append({"p_partkey": p["p_partkey"], "metric": "size",
                    "metric_value": float(p["p_size"])})
        out.append({"p_partkey": p["p_partkey"], "metric": "retailprice",
                    "metric_value": p["p_retailprice"]})
    assert_equal(spark, "q_unpivot", out)


def test_replay_q_semi_anti_join(spark):
    with_orders = {o["o_custkey"] for o in rows("orders")}
    n_has = sum(1 for c in rows("customer") if c["c_custkey"] in with_orders)
    n_not = sum(1 for c in rows("customer")
                if c["c_custkey"] not in with_orders)
    assert_equal(spark, "q_semi_anti_join", [
        {"tag": "has_orders", "n": n_has},
        {"tag": "no_orders", "n": n_not},
    ])


def test_replay_q_outer_join_agg(spark):
    cnt: dict = defaultdict(int)
    tot: dict = defaultdict(Decimal)
    for o in rows("orders"):
        cnt[o["o_custkey"]] += 1
        tot[o["o_custkey"]] += dec4(o["o_totalprice"])
    assert_equal(spark, "q_outer_join_agg", [
        {"c_custkey": c["c_custkey"],
         "order_count": cnt.get(c["c_custkey"], 0),
         "total_spent": float(tot.get(c["c_custkey"], Decimal(0)))}
        for c in rows("customer")
    ])


def test_replay_q_salted_join_agg(spark):
    pri = {o["o_orderkey"]: o["o_orderpriority"] for o in rows("orders")}
    n: dict = defaultdict(int)
    tot: dict = defaultdict(Decimal)
    for li in rows("lineitem"):
        p = pri.get(li["l_orderkey"])
        if p is None:
            continue
        n[p] += 1
        tot[p] += dec4(li["l_extendedprice"])
    assert_equal(spark, "q_salted_join_agg", [
        {"o_orderpriority": k, "n_items": n[k], "total_price": float(tot[k])}
        for k in n
    ])


def test_replay_q_set_operations(spark):
    building = {c["c_custkey"] for c in rows("customer")
                if c["c_mktsegment"] == "BUILDING"}
    rich = {c["c_custkey"] for c in rows("customer")
            if c["c_acctbal"] > 5000}
    out = [{"tag": "both", "c_custkey": k} for k in building & rich]
    out += [{"tag": "building_only", "c_custkey": k} for k in building - rich]
    assert_equal(spark, "q_set_operations", out)


def test_replay_q_scalar_string_math(spark):
    out = []
    for p in rows("part"):
        out.append({
            "p_partkey": p["p_partkey"],
            "name_lower": p["p_name"].lower(),
            "brand_upper": p["p_brand"].upper(),
            "name_len": len(p["p_name"]),
            "type_prefix": p["p_type"][:5],
            "brand_type": f"{p['p_brand']}:{p['p_type']}",
            "size_dist": abs(p["p_size"] - 25),
            "price_ceil": math.ceil(p["p_retailprice"]),
            "price_floor": math.floor(p["p_retailprice"]),
            "size_sqrt": rnd(math.sqrt(p["p_size"]), 4),
        })
    assert_equal(spark, "q_scalar_string_math", out)


def test_replay_q_date_functions(spark):
    n: dict = defaultdict(int)
    tot: dict = defaultdict(Decimal)
    for o in rows("orders"):
        k = (o["o_orderdate"].year, o["o_orderdate"].month)
        n[k] += 1
        tot[k] += dec4(o["o_totalprice"])
    assert_equal(spark, "q_date_functions", [
        {"order_year": k[0], "order_month": k[1], "n_orders": n[k],
         "month_value": float(tot[k])}
        for k in n
    ])


def test_replay_q_json_extract(spark):
    sums: dict = defaultdict(int)
    n: dict = defaultdict(int)
    for e in rows("events"):
        t = e["event_type"]
        n[t] += 1
        sums[t] += int(json.loads(e["props"])["k"])
    assert_equal(spark, "q_json_extract", [
        {"event_type": t, "sum_k": sums[t], "n": n[t]} for t in n
    ])


# ---------------------------------------------------------------------------
# Window plans
# ---------------------------------------------------------------------------


def test_replay_q_window_running_sum(spark):
    per_cust: dict = defaultdict(list)
    for o in rows("orders"):
        per_cust[o["o_custkey"]].append(o)
    out = []
    for ck, os_ in per_cust.items():
        os_.sort(key=lambda o: (o["o_orderdate"], o["o_orderkey"]))
        run = Decimal(0)
        prev = None
        for o in os_:
            run += dec4(o["o_totalprice"])
            out.append({"o_custkey": ck, "o_orderkey": o["o_orderkey"],
                        "running_total": float(run),
                        "prev_orderkey": prev})
            prev = o["o_orderkey"]
    assert_equal(spark, "q_window_running_sum", out)


def test_replay_q_window_topk_per_group(spark):
    per_cust: dict = defaultdict(list)
    for o in rows("orders"):
        per_cust[o["o_custkey"]].append(o)
    out = []
    for ck, os_ in per_cust.items():
        os_.sort(key=lambda o: (-o["o_totalprice"], o["o_orderkey"]))
        for rn, o in enumerate(os_[:3], start=1):
            out.append({"c_custkey": ck, "o_orderkey": o["o_orderkey"],
                        "o_totalprice": o["o_totalprice"], "rn": rn})
    assert_equal(spark, "q_window_topk_per_group", out)


def test_replay_q_window_ntile(spark):
    per_user: dict = defaultdict(Decimal)
    for e in rows("events"):
        per_user[(e["event_type"], e["user_id"])] += dec4(e["value"])
    groups: dict = defaultdict(list)
    for (t, u), v in per_user.items():
        groups[t].append((u, v))
    out = []
    for t, members in groups.items():
        members.sort(key=lambda m: (-m[1], m[0]))
        n = len(members)
        # RANK with ties on (-value, user) order: ties impossible
        # on user, so rank == row number except equal values with
        # equal sort keys (never: user breaks ties)
        base, rem = divmod(n, 4)
        tile_sizes = [base + (1 if i < rem else 0) for i in range(4)]
        tiles = []
        for i, sz in enumerate(tile_sizes, start=1):
            tiles.extend([i] * sz)
        # rank: position of first member with the same total_value
        first_at: dict = {}
        for idx, (u, v) in enumerate(members):
            first_at.setdefault(v, idx)
        n_le = {v: sum(1 for _, w in members if float(w) <= float(v))
                for _, v in members}
        for idx, (u, v) in enumerate(members):
            rnk = first_at[v] + 1
            # sort is value-desc: cume_dist = fraction with value >= v
            n_ge = sum(1 for _, w in members if float(w) >= float(v))
            out.append({
                "event_type": t, "user_id": u, "total_value": float(v),
                "rnk": rnk, "quartile": tiles[idx],
                "pct_rank": rnd((rnk - 1) / (n - 1), 6) if n > 1 else 0.0,
                "cume": rnd(n_ge / n, 6),
            })
    assert_equal(spark, "q_window_ntile", out)


def test_replay_q_window_range_frame(spark):
    per_user: dict = defaultdict(list)
    for e in rows("events"):
        us = int(e["ts"].timestamp() * 1_000_000)
        per_user[e["user_id"]].append((us, e))
    out = []
    hour = 3_600_000_000
    for evs in per_user.values():
        evs.sort(key=lambda p: p[0])
        for us, e in evs:
            frame = [x for t, x in evs if us - hour <= t <= us]
            out.append({
                "event_id": e["event_id"],
                "n_last_hour": len(frame),
                "max_last_hour": max(x["value"] for x in frame),
            })
    assert_equal(spark, "q_window_range_frame", out)


# ---------------------------------------------------------------------------
# Events plans
# ---------------------------------------------------------------------------


def test_replay_q_events_hourly(spark):
    n: dict = defaultdict(int)
    tot: dict = defaultdict(Decimal)
    for e in rows("events"):
        h = e["ts"].replace(minute=0, second=0, microsecond=0)
        k = (h.strftime("%Y-%m-%d %H:%M:%S"), e["event_type"])
        n[k] += 1
        tot[k] += dec4(e["value"])
    assert_equal(spark, "q_events_hourly", [
        {"hour": k[0], "event_type": k[1], "n_events": n[k],
         "total_value": float(tot[k])}
        for k in n
    ])


def test_replay_q_events_sessionize(spark):
    per_user: dict = defaultdict(list)
    for e in rows("events"):
        per_user[e["user_id"]].append(e)
    out = []
    for u, evs in per_user.items():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
        sid = 0
        prev_us = None
        sessions: dict = defaultdict(list)
        for e in evs:
            us = int(e["ts"].timestamp() * 1_000_000)
            if prev_us is None or us - prev_us >= 1_800_000_000:
                sid += 1
            sessions[sid].append(e)
            prev_us = us
        for sid_, ses in sessions.items():
            out.append({
                "user_id": u, "session_id": sid_, "n_events": len(ses),
                "session_start": min(e["ts"] for e in ses)
                .strftime("%Y-%m-%d %H:%M:%S"),
                "session_end": max(e["ts"] for e in ses)
                .strftime("%Y-%m-%d %H:%M:%S"),
            })
    assert_equal(spark, "q_events_sessionize", out)


def test_replay_q_event_funnel(spark):
    per_user: dict = defaultdict(list)
    for e in rows("events"):
        us = int(e["ts"].timestamp() * 1_000_000)
        per_user[e["user_id"]].append((us, e["event_type"]))
    t1: dict = {}
    t2: dict = {}
    t3: dict = {}
    for u, evs in per_user.items():
        views = [t for t, ty in evs if ty == "view"]
        if not views:
            continue
        t1[u] = min(views)
        clicks = [t for t, ty in evs if ty == "click" and t > t1[u]]
        if not clicks:
            continue
        t2[u] = min(clicks)
        buys = [t for t, ty in evs if ty == "purchase" and t > t2[u]]
        if buys:
            t3[u] = min(buys)
    assert_equal(spark, "q_event_funnel", [
        {"step": 1, "step_name": "view", "n_users": len(t1)},
        {"step": 2, "step_name": "click", "n_users": len(t2)},
        {"step": 3, "step_name": "purchase", "n_users": len(t3)},
    ])


def test_replay_q_value_histogram(spark):
    n: dict = defaultdict(int)
    tot: dict = defaultdict(Decimal)
    for e in rows("events"):
        v = dec4(e["value"])
        b = int(math.floor(float(v / 25)))
        k = (e["event_type"], b)
        n[k] += 1
        tot[k] += v
    assert_equal(spark, "q_value_histogram", [
        {"event_type": k[0], "bucket": k[1], "lo": k[1] * 25,
         "n_events": n[k], "total_value": float(tot[k])}
        for k in n
    ])


def test_replay_q_asof_join(spark):
    clicks: dict = defaultdict(list)
    for e in rows("events"):
        if e["event_type"] == "click":
            clicks[e["user_id"]].append(e)
    out = []
    for e in rows("events"):
        if e["event_type"] != "purchase":
            continue
        prior = [c for c in clicks.get(e["user_id"], ())
                 if c["ts"] < e["ts"]]
        best = max(prior, key=lambda c: (c["ts"], c["event_id"]),
                   default=None)
        out.append({
            "event_id": e["event_id"], "user_id": e["user_id"],
            "ts": e["ts"].strftime("%Y-%m-%d %H:%M:%S"),
            "prev_event_id": best["event_id"] if best else None,
            "prev_ts": best["ts"].strftime("%Y-%m-%d %H:%M:%S")
            if best else None,
        })
    assert_equal(spark, "q_asof_join", out)


# ---------------------------------------------------------------------------
# CDC / SCD / MV plans
# ---------------------------------------------------------------------------


def test_replay_q_cdc_merge(spark):
    base = {o["o_orderkey"]: o for o in rows("orders")
            if o["o_orderkey"] % 3 != 0}
    changes = {o["o_orderkey"]: o for o in rows("orders")
               if o["o_orderkey"] % 2 == 0}
    out = []
    for k in set(base) | set(changes):
        c = changes.get(k)
        b = base.get(k)
        if c is not None and k % 10 == 0:
            continue  # delete op (delete-of-absent also drops)
        if c is None:
            out.append({"o_orderkey": k,
                        "o_orderstatus": b["o_orderstatus"],
                        "price": float(dec4(b["o_totalprice"])),
                        "change": "kept"})
        else:
            newp = (dec4(c["o_totalprice"]) * Decimal("1.10")).quantize(
                D0001, rounding=ROUND_HALF_UP)
            out.append({"o_orderkey": k,
                        "o_orderstatus": c["o_orderstatus"],
                        "price": float(newp),
                        "change": "inserted" if b is None else "updated"})
    assert_equal(spark, "q_cdc_merge", out)


def test_replay_q_scd2_history(spark):
    per_user: dict = defaultdict(list)
    for e in rows("events"):
        per_user[e["user_id"]].append(e)
    out = []
    for u, evs in per_user.items():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
        changes = []
        prev = None
        for e in evs:
            if prev is None or e["event_type"] != prev:
                changes.append(e)
            prev = e["event_type"]
        for i, e in enumerate(changes):
            nxt = changes[i + 1]["ts"] if i + 1 < len(changes) else None
            out.append({
                "user_id": u, "version_n": i + 1,
                "event_type": e["event_type"],
                "valid_from": e["ts"].strftime("%Y-%m-%d %H:%M:%S"),
                "valid_to": nxt.strftime("%Y-%m-%d %H:%M:%S") if nxt else None,
                "is_current": 1 if nxt is None else 0,
            })
    assert_equal(spark, "q_scd2_history", out)


def test_replay_q_mv_incremental(spark):
    n: dict = defaultdict(int)
    tot: dict = defaultdict(Decimal)
    for o in rows("orders"):
        n[o["o_orderpriority"]] += 1
        tot[o["o_orderpriority"]] += dec4(o["o_totalprice"])
    assert_equal(spark, "q_mv_incremental", [
        {"o_orderpriority": k, "n_orders": n[k], "total_price": float(tot[k])}
        for k in n
    ])


# ---------------------------------------------------------------------------
# Behavioral analytics plans
# ---------------------------------------------------------------------------


def _monday(d):
    from datetime import timedelta
    return d - timedelta(days=d.weekday())


def test_replay_q_retention_cohorts(spark):
    first: dict = {}
    for e in rows("events"):
        u = e["user_id"]
        if u not in first or e["ts"] < first[u]:
            first[u] = e["ts"]
    active: dict = defaultdict(set)
    for e in rows("events"):
        cw = _monday(first[e["user_id"]].date())
        week_n = (e["ts"].date() - cw).days // 7
        active[(cw.strftime("%Y-%m-%d"), week_n)].add(e["user_id"])
    assert_equal(spark, "q_retention_cohorts", [
        {"cohort_week": k[0], "week_n": k[1], "n_active": len(v)}
        for k, v in active.items()
    ])


def test_replay_q_top_paths(spark):
    per_user: dict = defaultdict(list)
    for e in rows("events"):
        per_user[e["user_id"]].append(e)
    cnt: dict = defaultdict(int)
    for evs in per_user.values():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
        types = [e["event_type"] for e in evs]
        for i in range(len(types) - 2):
            cnt[" > ".join(types[i:i + 3])] += 1
    out = [{"path": p, "n": n} for p, n in cnt.items()]
    out.sort(key=lambda r: (-r["n"], r["path"]))
    assert_equal(spark, "q_top_paths", out[:20])


def test_replay_q_engagement_gaps(spark):
    per_user: dict = defaultdict(list)
    for e in rows("events"):
        per_user[e["user_id"]].append(e)
    dist: dict = defaultdict(int)
    for evs in per_user.values():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
        if len(evs) < 2:
            continue
        us = [int(e["ts"].timestamp() * 1_000_000) for e in evs]
        mx = max(b - a for a, b in zip(us, us[1:]))
        dist[mx // 86_400_000_000] += 1
    assert_equal(spark, "q_engagement_gaps", [
        {"gap_days": k, "n_users": v} for k, v in dist.items()
    ])


def _round_cents(v: float) -> int:
    return int(Decimal(str(v * 100)).quantize(
        Decimal(1), rounding=ROUND_HALF_UP))


def test_replay_q_new_vs_returning(spark):
    first_day: dict = {}
    for e in rows("events"):
        d = e["ts"].date()
        u = e["user_id"]
        if u not in first_day or d < first_day[u]:
            first_day[u] = d
    n: dict = defaultdict(int)
    cents: dict = defaultdict(int)
    for e in rows("events"):
        if e["event_type"] != "purchase":
            continue
        d = e["ts"].date()
        cohort = "new" if d == first_day[e["user_id"]] else "returning"
        n[(d, cohort)] += 1
        cents[(d, cohort)] += _round_cents(e["value"])
    assert_equal(spark, "q_new_vs_returning", [
        {"day": k[0], "cohort": k[1], "n_purchases": n[k],
         "revenue": rnd(cents[k] / 100.0, 2)}
        for k in n
    ])


def test_replay_q_stickiness(spark):
    day_users: dict = defaultdict(set)
    month_users: dict = defaultdict(set)
    for e in rows("events"):
        d = e["ts"].date()
        m = d.replace(day=1)
        day_users[(m, d)].add(e["user_id"])
        month_users[m].add(e["user_id"])
    agg: dict = defaultdict(lambda: [0, 0])
    for (m, _), us in day_users.items():
        agg[m][0] += len(us)
        agg[m][1] += 1
    out = []
    for m, (dau_sum, n_days) in agg.items():
        mau = len(month_users[m])
        out.append({
            "month": m.strftime("%Y-%m"), "n_days": n_days, "mau": mau,
            "avg_dau": rnd(dau_sum / n_days, 2),
            "stickiness": rnd(dau_sum / n_days / mau, 6),
        })
    assert_equal(spark, "q_stickiness", out)


def test_replay_q_single_source_risk(spark):
    supps: dict = defaultdict(set)
    cents: dict = defaultdict(int)
    for li in rows("lineitem"):
        supps[li["l_partkey"]].add(li["l_suppkey"])
        cents[li["l_partkey"]] += _round_cents(li["l_extendedprice"])
    singles = [k for k, v in supps.items() if len(v) == 1]
    assert_equal(spark, "q_single_source_risk", [{
        "n_single_source": len(singles),
        # SUM over an empty relation is NULL in both engines
        "revenue_at_risk": rnd(sum(cents[k] for k in singles) / 100.0, 2)
        if singles else None,
    }])


def test_replay_q_attribution_position(spark):
    per_user: dict = defaultdict(list)
    for e in rows("events"):
        per_user[e["user_id"]].append(e)
    credit: dict = defaultdict(int)
    touches_n: dict = defaultdict(int)
    direct_cr = 0
    direct_n = 0
    for u, evs in per_user.items():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
        jid = 0
        journeys: dict = defaultdict(lambda: {"touch": [], "purch": None})
        for e in evs:
            if e["event_type"] == "purchase":
                journeys[jid]["purch"] = _round_cents(e["value"])
                jid += 1
            else:
                journeys[jid]["touch"].append(e["event_type"])
        for j in journeys.values():
            cents, touch = j["purch"], j["touch"]
            if cents is None:
                continue
            k = len(touch)
            if k == 0:
                direct_cr += cents
                direct_n += 1
                continue
            if k == 1:
                base = [cents]
            elif k == 2:
                base = [cents * 500000 // 1000000] * 2
            else:
                mid = cents * (200000 // (k - 2)) // 1000000
                end = cents * 400000 // 1000000
                base = [end] + [mid] * (k - 2) + [end]
            base[-1] = cents - sum(base[:-1])
            for t, cr in zip(touch, base):
                credit[t] += cr
                touches_n[t] += 1
    out = [
        {"touch_type": t, "n_touches": touches_n[t],
         "credited_revenue": rnd(credit[t] / 100.0, 2)}
        for t in credit
    ]
    if direct_n:
        out.append({"touch_type": "direct", "n_touches": direct_n,
                    "credited_revenue": rnd(direct_cr / 100.0, 2)})
    assert_equal(spark, "q_attribution_position", out)


def _sessions_30min():
    per_user: dict = defaultdict(list)
    for e in rows("events"):
        per_user[e["user_id"]].append(e)
    out = []
    for u, evs in per_user.items():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
        cur: list = []
        prev_us = None
        for e in evs:
            us = int(e["ts"].timestamp() * 1_000_000)
            if prev_us is not None and us - prev_us < 1_800_000_000:
                cur.append(e)
            else:
                if cur:
                    out.append((u, cur))
                cur = [e]
            prev_us = us
        if cur:
            out.append((u, cur))
    return out


def test_replay_q_bounce_rate(spark):
    n: dict = defaultdict(int)
    bounce: dict = defaultdict(int)
    for _, ses in _sessions_30min():
        day = min(e["ts"] for e in ses).strftime("%Y-%m-%d")
        n[day] += 1
        if len(ses) == 1:
            bounce[day] += 1
    assert_equal(spark, "q_bounce_rate", [
        {"day": d, "n_sessions": n[d], "n_bounces": bounce[d],
         "bounce_rate": rnd(bounce[d] / n[d], 4)}
        for d in n
    ])


def test_replay_q_concurrent_sessions(spark):
    from datetime import timedelta
    cnt: dict = defaultdict(int)
    for _, ses in _sessions_30min():
        lo = min(e["ts"] for e in ses).replace(
            minute=0, second=0, microsecond=0)
        hi = (max(e["ts"] for e in ses) + timedelta(minutes=30)).replace(
            minute=0, second=0, microsecond=0)
        h = lo
        while h <= hi:
            cnt[h.strftime("%Y-%m-%d %H:%M:%S")] += 1
            h += timedelta(hours=1)
    assert_equal(spark, "q_concurrent_sessions", [
        {"hour": h, "n_active_sessions": v} for h, v in cnt.items()
    ])


def test_replay_q_timed_funnel(spark):
    from datetime import timedelta
    per_user: dict = defaultdict(list)
    users = set()
    for e in rows("events"):
        users.add(e["user_id"])
        per_user[e["user_id"]].append(e)
    n_view = n_click = n_purchase = 0
    for evs in per_user.values():
        views = [e["ts"] for e in evs if e["event_type"] == "view"]
        if not views:
            continue
        n_view += 1
        tv = min(views)
        clicks = [e["ts"] for e in evs if e["event_type"] == "click"
                  and tv < e["ts"] <= tv + timedelta(minutes=60)]
        if not clicks:
            continue
        n_click += 1
        tc = min(clicks)
        buys = [e["ts"] for e in evs if e["event_type"] == "purchase"
                and tc < e["ts"] <= tc + timedelta(minutes=60)]
        if buys:
            n_purchase += 1
    assert_equal(spark, "q_timed_funnel", [{
        "n_users": len(users), "reached_view": n_view,
        "reached_click": n_click, "reached_purchase": n_purchase,
        "view_to_click_pct": rnd(100.0 * n_click / n_view, 4),
        "click_to_purchase_pct": rnd(100.0 * n_purchase / n_click, 4),
    }])


def test_replay_q_event_transitions(spark):
    per_user: dict = defaultdict(list)
    for e in rows("events"):
        per_user[e["user_id"]].append(e)
    trans: dict = defaultdict(int)
    for evs in per_user.values():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
        for a, b in zip(evs, evs[1:]):
            trans[(a["event_type"], b["event_type"])] += 1
    outs: dict = defaultdict(int)
    for (a, _), v in trans.items():
        outs[a] += v
    assert_equal(spark, "q_event_transitions", [
        {"from_type": k[0], "to_type": k[1], "n": v,
         "p_transition": rnd(v / outs[k[0]], 4)}
        for k, v in trans.items()
    ])


def test_replay_q_event_cooccurrence(spark):
    ut: dict = defaultdict(set)
    users = set()
    for e in rows("events"):
        ut[e["event_type"]].add(e["user_id"])
        users.add(e["user_id"])
    n = len(users)
    types = sorted(ut)
    out = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            both = len(ut[a] & ut[b])
            if not both:
                continue
            out.append({
                "type_a": a, "type_b": b, "n_both": both,
                "support": rnd(both / n, 4),
                "confidence_a_to_b": rnd(both / len(ut[a]), 4),
                "lift": rnd(both * n / (len(ut[a]) * len(ut[b])), 4),
            })
    assert_equal(spark, "q_event_cooccurrence", out)


def test_replay_q_user_journeys(spark):
    per_user: dict = defaultdict(list)
    for e in rows("events"):
        per_user[e["user_id"]].append(e)
    cnt: dict = defaultdict(int)
    for evs in per_user.values():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
        cnt[">".join(e["event_type"] for e in evs[:5])] += 1
    out = [{"journey": j, "n_users": v} for j, v in cnt.items()]
    out.sort(key=lambda r: (-r["n_users"], r["journey"]))
    assert_equal(spark, "q_user_journeys", out[:20])


def test_replay_q_signup_retention(spark):
    from datetime import date, timedelta
    signup: dict = {}
    for e in rows("events"):
        if e["event_type"] != "signup":
            continue
        u = e["user_id"]
        if u not in signup or e["ts"] < signup[u]:
            signup[u] = e["ts"]
    anchor = date(2024, 1, 1)
    cohort: dict = {}
    for u, ts in signup.items():
        d = ts.date()
        cohort[u] = d - timedelta(days=(d - anchor).days % 7)
    sizes: dict = defaultdict(int)
    for cw in cohort.values():
        sizes[cw] += 1
    active: dict = defaultdict(set)
    for e in rows("events"):
        cw = cohort.get(e["user_id"])
        if cw is None or e["ts"].date() < cw:
            continue
        week_n = (e["ts"].date() - cw).days // 7
        active[(cw, week_n)].add(e["user_id"])
    assert_equal(spark, "q_signup_retention", [
        {"cohort_week": k[0], "week_n": k[1], "n_active": len(v),
         "cohort_size": sizes[k[0]],
         "retention_e4": 10000 * len(v) // sizes[k[0]]}
        for k, v in active.items()
    ])


# ---------------------------------------------------------------------------
# Profiling / data-quality plans
# ---------------------------------------------------------------------------


def test_replay_q_iqr_outliers(spark):
    v4 = sorted(
        int(Decimal(str(e["value"] * 10000)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP))
        for e in rows("events") if e["value"] is not None
    )
    n = len(v4)

    def interp(q):
        pos = (n - 1) * q
        lo = v4[math.floor(pos)]
        hi = v4[min(math.floor(pos) + 1, n - 1)]
        return lo + (hi - lo) * (pos - math.floor(pos))

    q1c, q3c = interp(0.25), interp(0.75)
    iqr_c = q3c - q1c
    lo_f, hi_f = q1c - 1.5 * iqr_c, q3c + 1.5 * iqr_c
    assert_equal(spark, "q_iqr_outliers", [{
        "n_values": n,
        "q1": rnd(q1c / 10000.0, 4), "q3": rnd(q3c / 10000.0, 4),
        "iqr": rnd(iqr_c / 10000.0, 4),
        "n_low_outliers": sum(1 for v in v4 if v < lo_f),
        "n_high_outliers": sum(1 for v in v4 if v > hi_f),
    }])


def test_replay_q_skew_profile(spark):
    cnt: dict = defaultdict(int)
    for o in rows("orders"):
        cnt[o["o_custkey"]] += 1
    n_rows = sum(cnt.values())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    top10 = sum(c for _, c in ranked[:10])
    assert_equal(spark, "q_skew_profile", [{
        "n_keys": len(cnt), "n_rows": n_rows,
        "max_c": max(cnt.values()), "min_c": min(cnt.values()),
        "top10_rows": top10,
        "max_skew_ratio": rnd(max(cnt.values()) * len(cnt) / n_rows, 4),
        "top10_share": rnd(top10 / n_rows, 4),
    }])


def test_replay_q_join_cardinality_estimate(spark):
    co: dict = defaultdict(int)
    for o in rows("orders"):
        co[o["o_custkey"]] += 1
    cc: dict = defaultdict(int)
    for c in rows("customer"):
        cc[c["c_custkey"]] += 1
    est = sum(co[k] * cc[k] for k in co if k in cc)
    actual = sum(co[k] * cc[k] for k in co if k in cc)  # same: equi-join
    assert_equal(spark, "q_join_cardinality_estimate", [{
        "est_rows": est, "actual_rows": actual, "est_error": est - actual,
    }])


def test_replay_q_dq_checks(spark):
    orders_ = rows("orders")
    li = rows("lineitem")
    cust = {c["c_custkey"] for c in rows("customer")}
    okeys = {o["o_orderkey"] for o in orders_}
    okey_cnt: dict = defaultdict(int)
    for o in orders_:
        okey_cnt[o["o_orderkey"]] += 1
    checks = {
        "lineitem_orphans": sum(
            1 for x in li if x["l_orderkey"] not in okeys),
        "orders_orphans": sum(
            1 for o in orders_ if o["o_custkey"] not in cust),
        "orders_nonpositive_price": sum(
            1 for o in orders_ if o["o_totalprice"] <= 0),
        "orders_null_keys": sum(
            1 for o in orders_
            if o["o_orderkey"] is None or o["o_custkey"] is None),
        "orders_dup_pk": sum(c - 1 for c in okey_cnt.values() if c > 1),
        "lineitem_qty_range": sum(
            1 for x in li if x["l_quantity"] < 1 or x["l_quantity"] > 50),
    }
    assert_equal(spark, "q_dq_checks", [
        {"check_name": k, "n_violations": v} for k, v in checks.items()
    ])


def test_replay_q_brand_markup(spark):
    part = {p["p_partkey"]: p for p in rows("part")}
    acc: dict = defaultdict(list)
    for li in rows("lineitem"):
        p = part.get(li["l_partkey"])
        if p is None or li["l_quantity"] <= 0 or p["p_retailprice"] <= 0:
            continue
        r = (li["l_extendedprice"] / li["l_quantity"]) / p["p_retailprice"]
        r_e6 = int(Decimal(str(1000000.0 * r)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP))
        acc[p["p_brand"]].append(r_e6)
    assert_equal(spark, "q_brand_markup", [
        {"brand": b, "n_lineitems": len(v),
         "avg_markup_ratio": rnd(sum(v) / len(v) / 1000000.0, 6),
         "min_markup_ratio": rnd(min(v) / 1000000.0, 6),
         "max_markup_ratio": rnd(max(v) / 1000000.0, 6)}
        for b, v in acc.items()
    ])


# ---------------------------------------------------------------------------
# LLM-pipeline text / dedup / similarity plans
# ---------------------------------------------------------------------------


def _md5(s: str) -> str:
    import hashlib
    return hashlib.md5(s.encode()).hexdigest()


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().split(" ") if t != ""]


def _shingles(toks: list[str], w: int) -> list[str]:
    return [" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)]


def _bucket(salt: str, key) -> int:
    h = _md5(f"{salt}:{key}")
    nib = "0123456789abcdef"
    return (nib.index(h[0]) * 4096 + nib.index(h[1]) * 256
            + nib.index(h[2]) * 16 + nib.index(h[3])) % 1000


def test_replay_q_token_count(spark):
    import re
    out = []
    for d in rows("documents"):
        low = d["text"].lower()
        out.append({
            "doc_id": d["doc_id"],
            "n_ws_tokens": len(_toks(d["text"])),
            "n_re_tokens": len(re.findall(r"[a-z]+|[0-9]+", low)),
        })
    assert_equal(spark, "q_token_count", out)


def test_replay_q_text_quality(spark):
    out = []
    punct = set(".,!?;:")
    stop = {"the", "a", "of", "and", "to"}
    for d in rows("documents"):
        toks = _toks(d["text"])
        n_p = sum(1 for ch in d["text"] if ch in punct)
        out.append({
            "doc_id": d["doc_id"],
            "n_chars_m": len(d["text"]),
            "n_tokens": len(toks),
            "avg_token_len": rnd(sum(len(t) for t in toks) / len(toks), 4)
            if toks else None,
            "punct_ratio": rnd(n_p / len(d["text"]), 4)
            if d["text"] else None,
            "stopword_ratio": rnd(
                sum(1 for t in toks if t in stop) / len(toks), 4)
            if toks else None,
        })
    assert_equal(spark, "q_text_quality", out)


def test_replay_q_normalize_text(spark):
    import re
    out = []
    for d in rows("documents"):
        norm = re.sub(r"[.,!?;:]", "", d["text"])
        norm = re.sub(r" +", " ", norm).strip().lower()
        out.append({
            "doc_id": d["doc_id"],
            "norm_hash": _md5(norm),
            "n_chars_norm": len(norm),
            "n_tokens_norm": len([t for t in norm.split(" ") if t != ""]),
        })
    assert_equal(spark, "q_normalize_text", out)


def test_replay_q_corpus_clean(spark):
    docs = rows("documents")
    q = [d for d in docs if len(_toks(d["text"])) >= 30]
    keep: dict = {}
    for d in q:
        h = _md5(d["text"])
        if h not in keep or d["doc_id"] < keep[h]:
            keep[h] = d["doc_id"]
    out = [
        {"doc_id": d["doc_id"], "n_tokens": len(_toks(d["text"]))}
        for d in q
        if d["lang"] == "en" and keep[_md5(d["text"])] == d["doc_id"]
    ]
    assert_equal(spark, "q_corpus_clean", out)


_LANG_STOPS = {
    "de": {"der", "die", "das", "und", "ist"},
    "en": {"the", "a", "of", "and", "to"},
    "es": {"el", "los", "las", "y", "es"},
    "fr": {"le", "la", "les", "et", "est"},
    "zh": {"de5", "le5", "shi4", "zai4", "he2"},
}


def test_replay_q_langid_eval(spark):
    conf: dict = defaultdict(int)
    for d in rows("documents"):
        toks = _toks(d["text"])
        scores = {
            cand: sum(1 for t in toks if t in stops)
            for cand, stops in _LANG_STOPS.items()
        }
        pred = min(scores, key=lambda c: (-scores[c], c))
        conf[(d["lang"], pred)] += 1
    actual: dict = defaultdict(int)
    for (lang, _), n in conf.items():
        actual[lang] += n
    assert_equal(spark, "q_langid_eval", [
        {"actual": k[0], "predicted": k[1], "n_docs": v,
         "row_pct": rnd(100.0 * v / actual[k[0]], 4)}
        for k, v in conf.items()
    ])


def test_replay_q_quality_floor(spark):
    scored: dict = defaultdict(list)
    for d in rows("documents"):
        toks = _toks(d["text"])
        if not toks:
            continue
        stops = _LANG_STOPS.get(d["lang"], set())
        ratio = sum(1 for t in toks if t in stops) / len(toks)
        scored[d["lang"]].append((d["doc_id"], ratio))
    out = []
    for lang, members in scored.items():
        members.sort(key=lambda m: (m[1], m[0]))
        n = len(members)
        for idx, (doc, ratio) in enumerate(members):
            pr = idx / (n - 1) if n > 1 else 0.0
            if pr >= 0.25:
                out.append({"doc_id": doc, "lang": lang,
                            "stopword_ratio": rnd(ratio, 4),
                            "pr": rnd(pr, 4)})
    assert_equal(spark, "q_quality_floor", out)


def _jaccard_pairs(w: int, thresh: float):
    """Distinct-shingle Jaccard pairs over the corpus (hot shingles
    in >1000 docs excluded), as (doc_a, doc_b) -> jaccard."""
    sh: dict = {}
    for d in rows("documents"):
        sh[d["doc_id"]] = set(_shingles(_toks(d["text"]), w))
    cnt: dict = defaultdict(int)
    for s in sh.values():
        for g in s:
            cnt[g] += 1
    hot = {g for g, c in cnt.items() if c > 1000}
    shp = {doc: s - hot for doc, s in sh.items()}
    ids = sorted(shp)
    pairs = {}
    by_shingle: dict = defaultdict(list)
    for doc in ids:
        for g in shp[doc]:
            by_shingle[g].append(doc)
    inter: dict = defaultdict(int)
    for docs_ in by_shingle.values():
        for i, a in enumerate(docs_):
            for b in docs_[i + 1:]:
                inter[(min(a, b), max(a, b))] += 1
    for (a, b), ni in inter.items():
        j = rnd(ni / (len(shp[a]) + len(shp[b]) - ni), 4)
        if j >= thresh:
            pairs[(a, b)] = j
    return pairs, shp


def test_replay_q_ngram_jaccard(spark):
    pairs, _ = _jaccard_pairs(5, 0.2)
    assert_equal(spark, "q_ngram_jaccard", [
        {"doc_a": a, "doc_b": b, "jaccard": j}
        for (a, b), j in pairs.items()
    ])


def _components(pairs) -> dict:
    """doc -> min-doc-id of its connected component over ALL docs."""
    adj: dict = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    cluster: dict = {}
    for d in rows("documents"):
        doc = d["doc_id"]
        if doc in cluster:
            continue
        comp = {doc}
        stack = [doc]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in comp:
                    comp.add(y)
                    stack.append(y)
        m = min(comp)
        for x in comp:
            cluster[x] = m
    return cluster


def test_replay_q_dup_clusters(spark):
    pairs, _ = _jaccard_pairs(5, 0.2)
    cluster = _components(pairs)
    assert_equal(spark, "q_dup_clusters", [
        {"doc_id": doc, "cluster_id": c} for doc, c in cluster.items()
    ])


def test_replay_q_dedup_keep_best(spark):
    pairs, _ = _jaccard_pairs(5, 0.2)
    cluster = _components(pairs)
    nchars = {d["doc_id"]: d["n_chars"] for d in rows("documents")}
    members: dict = defaultdict(list)
    for doc, c in cluster.items():
        members[c].append(doc)
    out = []
    for c, docs_ in members.items():
        docs_.sort(key=lambda d: (-nchars[d], d))
        out.append({"cluster_id": c, "kept_doc_id": docs_[0],
                    "kept_n_chars": nchars[docs_[0]],
                    "n_members": len(docs_)})
    assert_equal(spark, "q_dedup_keep_best", out)


def test_replay_q_dup_rate_by_source(spark):
    n: dict = defaultdict(int)
    hashes: dict = defaultdict(set)
    for d in rows("documents"):
        n[d["source"]] += 1
        hashes[d["source"]].add(_md5(d["text"]))
    assert_equal(spark, "q_dup_rate_by_source", [
        {"source": s, "n_docs": n[s], "n_distinct": len(hashes[s]),
         "n_dups": n[s] - len(hashes[s]),
         "dup_rate": rnd((n[s] - len(hashes[s])) / n[s], 6)}
        for s in n
    ])


def test_replay_q_dedup_savings(spark):
    docs = rows("documents")
    keep: dict = {}
    for d in docs:
        h = _md5(d["text"])
        if h not in keep or d["doc_id"] < keep[h]:
            keep[h] = d["doc_id"]
    agg: dict = defaultdict(lambda: [0, 0, 0, 0])
    for d in docs:
        a = agg[d["source"]]
        nt = len(_toks(d["text"]))
        dup = keep[_md5(d["text"])] != d["doc_id"]
        a[0] += 1
        a[1] += 1 if dup else 0
        a[2] += nt
        a[3] += nt if dup else 0
    assert_equal(spark, "q_dedup_savings", [
        {"source": s, "n_docs": a[0], "n_dup_docs": a[1],
         "tokens_total": a[2], "tokens_saved": a[3],
         "savings_pct": rnd(100.0 * a[3] / a[2], 4) if a[2] else None}
        for s, a in agg.items()
    ])


def test_replay_q_incremental_dedup(spark):
    docs = rows("documents")
    is_old = {d["doc_id"]: _bucket("inc", d["doc_id"]) % 10 < 8
              for d in docs}
    sh = {d["doc_id"]: set(_shingles(_toks(d["text"]), 5)) for d in docs}
    old_cnt: dict = defaultdict(int)
    for doc, s in sh.items():
        if is_old[doc]:
            for g in s:
                old_cnt[g] += 1
    hot = {g for g, c in old_cnt.items() if c > 1000}
    out = []
    for d in docs:
        nd = d["doc_id"]
        if is_old[nd]:
            continue
        ns = sh[nd] - hot
        best = None
        for od in sh:
            if not is_old[od]:
                continue
            os_ = sh[od] - hot
            ni = len(ns & os_)
            if not ni:
                continue
            j = rnd(ni / (len(ns) + len(os_) - ni), 4)
            if j >= 0.5 and (best is None or (-j, od) < (-best[1], best[0])):
                best = (od, j)
        out.append({
            "doc_id": nd, "is_dup": 1 if best else 0,
            "best_match": best[0] if best else None,
            "best_jaccard": best[1] if best else None,
        })
    assert_equal(spark, "q_incremental_dedup", out)


def test_replay_q_minhash_near_dups(spark):
    sh = {d["doc_id"]: set(_shingles(_toks(d["text"]), 3))
          for d in rows("documents")}
    bands: dict = defaultdict(list)
    for doc, s in sh.items():
        if not s:
            continue
        sig = [min(_md5(f"{seed}#{g}") for g in s) for seed in range(16)]
        for band in range(8):
            bh = _md5("".join(sig[band * 2:band * 2 + 2]))
            bands[(band, bh)].append(doc)
    cands = set()
    for docs_ in bands.values():
        for i, a in enumerate(sorted(docs_)):
            for b in sorted(docs_)[i + 1:]:
                if a < b:
                    cands.add((a, b))
    out = []
    for a, b in cands:
        ni = len(sh[a] & sh[b])
        j = rnd(ni / (len(sh[a]) + len(sh[b]) - ni), 4)
        if j >= 0.5:
            out.append({"doc_a": a, "doc_b": b, "jaccard": j})
    assert_equal(spark, "q_minhash_near_dups", out)


def test_replay_q_dup_size_hist(spark):
    fp: dict = defaultdict(int)
    for d in rows("documents"):
        fp[_md5(" ".join(sorted(set(_toks(d["text"])))))] += 1
    hist: dict = defaultdict(int)
    for sz in fp.values():
        hist[sz] += 1
    assert_equal(spark, "q_dup_size_hist", [
        {"cluster_size": sz, "n_clusters": n, "n_docs": sz * n,
         "removable_docs": (sz - 1) * n}
        for sz, n in hist.items()
    ])


def test_replay_q_ngram_novelty(spark):
    docs = rows("documents")
    seen = set()
    for d in docs:
        if _bucket("inc", d["doc_id"]) % 10 < 8:
            for g in _shingles(_toks(d["text"]), 8):
                seen.add(_md5(g)[:16])
    out = []
    for d in docs:
        if _bucket("inc", d["doc_id"]) % 10 < 8:
            continue
        grams = [_md5(g)[:16] for g in _shingles(_toks(d["text"]), 8)]
        if not grams:
            continue
        novel = sum(1 for g in grams if g not in seen)
        out.append({
            "doc_id": d["doc_id"], "n_grams": len(grams), "n_novel": novel,
            "novelty": rnd(novel / max(len(grams), 1), 6),
        })
    assert_equal(spark, "q_ngram_novelty", out)


def test_replay_q_unigram_logprob(spark):
    docs = rows("documents")
    uni: dict = defaultdict(int)
    for d in docs:
        for t in _toks(d["text"]):
            uni[t] += 1
    tot = sum(uni.values())
    out = []
    for d in docs:
        toks = _toks(d["text"])
        lp = sum(
            int(Decimal(str(math.log(uni[t] / tot) * 10000)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP))
            for t in toks
        )
        out.append({"doc_id": d["doc_id"], "n_tokens": len(toks),
                    "logprob_tenk": lp})
    assert_equal(spark, "q_unigram_logprob", out)


def test_replay_q_bigram_topk(spark):
    cnt: dict = defaultdict(int)
    for d in rows("documents"):
        toks = _toks(d["text"])
        for a, b in zip(toks, toks[1:]):
            cnt[f"{a} {b}"] += 1
    out = [{"bigram": k, "n": v} for k, v in cnt.items()]
    out.sort(key=lambda r: (-r["n"], r["bigram"]))
    assert_equal(spark, "q_bigram_topk", out[:50])


def test_replay_q_cosine_topk(spark):
    embs = {e["vec_id"]: [float(x) for x in e["embedding"]]
            for e in rows("embeddings")}
    nrm = {k: math.sqrt(sum(x * x for x in v)) for k, v in embs.items()}
    out = []
    for qid in sorted(k for k in embs if k <= 5):
        scored = []
        for vid, v in embs.items():
            if vid == qid:
                continue
            cos = rnd(sum(a * b for a, b in zip(embs[qid], v))
                      / (nrm[qid] * nrm[vid]), 4)
            scored.append((cos, vid))
        scored.sort(key=lambda s: (-s[0], s[1]))
        for rk, (cos, vid) in enumerate(scored[:5], start=1):
            out.append({"query_id": qid, "vec_id": vid, "cosine": cos,
                        "rank": rk})
    assert_equal(spark, "q_cosine_topk", out)


def test_replay_q_embedding_norm(spark):
    out = []
    for e in rows("embeddings"):
        n = math.sqrt(sum(float(x) * float(x) for x in e["embedding"]))
        out.append({"vec_id": e["vec_id"], "l2_norm": rnd(n, 6)})
    assert_equal(spark, "q_embedding_norm", out)


def test_replay_q_grouped_zscore(spark):
    groups: dict = defaultdict(list)
    for o in rows("orders"):
        groups[o["o_custkey"]].append(
            (o["o_orderkey"], _round_cents(o["o_totalprice"])))
    out = []
    for ck, members in groups.items():
        n = len(members)
        if n <= 1:
            continue
        s1 = sum(c for _, c in members)
        s2 = sum(c * c for _, c in members)
        sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
        for ok, c in members:
            out.append({"o_orderkey": ok, "o_custkey": ck,
                        "z": rnd((c - s1 / n) / sd, 4)})
    assert_equal(spark, "q_grouped_zscore", out)


# ---------------------------------------------------------------------------
# Graph / retrieval-fusion / stats / sampling plans
# ---------------------------------------------------------------------------


def test_replay_q_degree_distribution(spark):
    po: dict = defaultdict(set)
    for li in rows("lineitem"):
        po[li["l_orderkey"]].add(li["l_partkey"])
    edges = set()
    for parts in po.values():
        if len(parts) > 256:
            continue
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                edges.add((a, b))
    deg: dict = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    binned: dict = defaultdict(list)
    for d in deg.values():
        binned[d.bit_length() - 1].append(d)
    assert_equal(spark, "q_degree_distribution", [
        {"log2_degree": b, "n_nodes": len(ds), "min_degree": min(ds),
         "max_degree": max(ds), "edge_endpoints": sum(ds)}
        for b, ds in binned.items()
    ])


def test_replay_q_pagerank(spark):
    pairs, _ = _jaccard_pairs(5, 0.2)
    edges = []
    for a, b in pairs:
        edges.append((a, b))
        edges.append((b, a))
    deg: dict = defaultdict(int)
    for a, _ in edges:
        deg[a] += 1
    all_docs = [d["doc_id"] for d in rows("documents")]
    r = {doc: 1_000_000 for doc in all_docs}
    for _ in range(10):
        inflow: dict = defaultdict(int)
        for a, b in edges:
            inflow[b] += r[a] // deg[a]
        r = {doc: 150_000 + (85 * inflow.get(doc, 0)) // 100
             for doc in all_docs}
    assert_equal(spark, "q_pagerank", [
        {"doc_id": doc, "rank_micro": v} for doc, v in r.items()
    ])


def test_replay_q_rrf_fusion(spark):
    docs = rows("documents")
    toks = {d["doc_id"]: _toks(d["text"]) for d in docs}
    dl = {doc: len(t) for doc, t in toks.items()}
    d_toks = {doc: len(set(t)) for doc, t in toks.items()}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    terms = ("filter", "window", "stream")
    tf: dict = defaultdict(dict)
    for doc, t in toks.items():
        for term in terms:
            c = t.count(term)
            if c:
                tf[term][doc] = c
    bm: dict = defaultdict(int)
    for term, per_doc in tf.items():
        df = len(per_doc)
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for doc, f in per_doc.items():
            contrib = (idf * f * 2.2
                       / (f + 1.2 * (0.25 + 0.75 * dl[doc] / avgdl)))
            bm[doc] += int(Decimal(str(contrib * 1000000)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP))
    r1 = {doc: rk for rk, (s, doc) in enumerate(
        sorted(((s, doc) for doc, s in bm.items()),
               key=lambda p: (-p[0], p[1]))[:100], start=1)}
    qual = {doc: 1_000_000 * d_toks[doc] // dl[doc]
            for doc in dl if dl[doc] > 0}
    r2 = {doc: rk for rk, (q, doc) in enumerate(
        sorted(((q, doc) for doc, q in qual.items()),
               key=lambda p: (-p[0], p[1]))[:100], start=1)}
    out = []
    for doc in set(r1) | set(r2):
        rrf = ((1.0 / (60 + r1[doc]) if doc in r1 else 0.0)
               + (1.0 / (60 + r2[doc]) if doc in r2 else 0.0))
        out.append({"doc_id": doc, "r_bm25": r1.get(doc),
                    "r_quality": r2.get(doc), "rrf_score": rnd(rrf, 6)})
    out.sort(key=lambda r_: (-r_["rrf_score"], r_["doc_id"]))
    assert_equal(spark, "q_rrf_fusion", out[:20])


def test_replay_q_retrieval_mrr(spark):
    docs = rows("documents")
    toks = {d["doc_id"]: _toks(d["text"]) for d in docs}
    dl = {doc: len(t) for doc, t in toks.items()}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    tfc: dict = defaultdict(dict)
    for doc, t in toks.items():
        for term in t:
            tfc[term][doc] = tfc[term].get(doc, 0) + 1
    dfc = {term: len(per) for term, per in tfc.items()}

    def i_rnd(x, nd=0):
        q = Decimal(1).scaleb(-nd)
        return Decimal(str(x)).quantize(q, rounding=ROUND_HALF_UP)

    qids = sorted(doc for doc in dl if doc <= 5)
    lex: dict = {}
    for qid in qids:
        scored_terms = sorted(
            ((float(i_rnd(c * math.log(n / dfc[t]), 6)), t)
             for t, c in ((t, tfc[t][qid]) for t in set(toks[qid]))),
            key=lambda p: (-p[0], p[1]))
        qterms = [t for _, t in scored_terms[:8]]
        scores: dict = defaultdict(int)
        for term in qterms:
            df = dfc[term]
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            for doc, f in tfc[term].items():
                if doc == qid:
                    continue
                c = int(i_rnd(idf * f * 2.2
                              / (f + 1.2 * (0.25 + 0.75 * dl[doc] / avgdl))
                              * 1000000))
                scores[doc] += c
        ranked = sorted(
            ((rnd(s / 1000000.0, 4), doc) for doc, s in scores.items()),
            key=lambda p: (-p[0], p[1]))
        lex[qid] = {doc: rk for rk, (_, doc) in
                    enumerate(ranked[:20], start=1)}
    embs = {e["vec_id"]: [float(x) for x in e["embedding"]]
            for e in rows("embeddings")}
    nrm = {k: math.sqrt(sum(x * x for x in v)) for k, v in embs.items()}
    vqids = sorted(k for k in embs if k <= 5)
    vec: dict = {}
    truth: dict = {}
    for qid in vqids:
        ranked = sorted(
            ((rnd(sum(a * b for a, b in zip(embs[qid], embs[v]))
                  / (nrm[qid] * nrm[v]), 4), v)
             for v in embs if v != qid),
            key=lambda p: (-p[0], p[1]))
        vec[qid] = {doc: rk for rk, (_, doc) in
                    enumerate(ranked[:20], start=1)}
        truth[qid] = ranked[0][1]
    fused_rank: dict = {}
    for qid in set(lex) | set(vec):
        cand = set(lex.get(qid, {})) | set(vec.get(qid, {}))
        scored = []
        for doc in cand:
            nano = 0
            if doc in lex.get(qid, {}):
                nano += int(i_rnd(1e9 / (60 + lex[qid][doc])))
            if doc in vec.get(qid, {}):
                nano += int(i_rnd(1e9 / (60 + vec[qid][doc])))
            scored.append((nano, doc))
        scored.sort(key=lambda p: (-p[0], p[1]))
        fused_rank[qid] = {doc: rk for rk, (_, doc) in
                           enumerate(scored, start=1)}
    rr = []
    for qid in truth:
        fr = fused_rank.get(qid, {}).get(truth[qid])
        hit = fr is not None and fr <= 10
        rr.append({"query_id": qid, "truth_doc": truth[qid],
                   "rank_in_fused": fr if hit else None,
                   "rr_micro": 1_000_000 // fr if hit else 0})
    mrr = sum(r_["rr_micro"] for r_ in rr) // len(rr)
    for r_ in rr:
        r_["mrr_micro"] = mrr
    assert_equal(spark, "q_retrieval_mrr", rr)


def test_replay_q_abc_analysis(spark):
    cents: dict = defaultdict(int)
    for li in rows("lineitem"):
        cents[li["l_partkey"]] += _round_cents(li["l_extendedprice"])
    ranked = sorted(cents.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = sum(cents.values())
    agg: dict = defaultdict(lambda: [0, 0])
    cum = 0
    for _, c in ranked:
        cum += c
        cls = "A" if 100 * cum <= 80 * tot else (
            "B" if 100 * cum <= 95 * tot else "C")
        agg[cls][0] += 1
        agg[cls][1] += c
    assert_equal(spark, "q_abc_analysis", [
        {"abc_class": k, "n_parts": v[0], "revenue": rnd(v[1] / 100.0, 2)}
        for k, v in agg.items()
    ])


def _pearson(pts):
    n = float(len(pts))
    sx = float(sum(x for x, _ in pts))
    sy = float(sum(y for _, y in pts))
    sxx = float(sum(x * x for x, _ in pts))
    syy = float(sum(y * y for _, y in pts))
    sxy = float(sum(x * y for x, y in pts))
    den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return (n * sxy - sx * sy) / den if den else None


def test_replay_q_feature_corr(spark):
    feats = []
    for li in rows("lineitem"):
        feats.append({
            "disc_c": _round_cents(li["l_discount"]),
            "price_c": _round_cents(li["l_extendedprice"]),
            "qty": int(li["l_quantity"]),
            "tax_c": _round_cents(li["l_tax"]),
        })
    names = ["disc_c", "price_c", "qty", "tax_c"]
    out = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            c = _pearson([(f[a], f[b]) for f in feats])
            out.append({"feat_a": a, "feat_b": b,
                        "corr": rnd(c, 6) if c is not None else None})
    assert_equal(spark, "q_feature_corr", out)


def test_replay_q_group_corr(spark):
    brand = {p["p_partkey"]: p["p_brand"] for p in rows("part")}
    pts: dict = defaultdict(list)
    for li in rows("lineitem"):
        b = brand.get(li["l_partkey"])
        if b is not None:
            pts[b].append((_round_cents(li["l_discount"]),
                           int(li["l_quantity"])))
    out = []
    for b, p in pts.items():
        c = _pearson(p)
        out.append({"brand": b, "n_lines": len(p),
                    "corr_discount_qty": rnd(c, 6) if c is not None
                    else None})
    assert_equal(spark, "q_group_corr", out)


def test_replay_q_group_trend(spark):
    nat = {n["n_nationkey"]: n["n_name"] for n in rows("nation")}
    cnat = {c["c_custkey"]: nat[c["c_nationkey"]] for c in rows("customer")}
    monthly: dict = defaultdict(int)
    for o in rows("orders"):
        d = o["o_orderdate"]
        m = (d.year - 1992) * 12 + (d.month - 1)
        monthly[(cnat[o["o_custkey"]], m)] += _round_cents(o["o_totalprice"])
    per_nat: dict = defaultdict(list)
    for (nm, m), rev in monthly.items():
        per_nat[nm].append((m, rev))
    out = []
    for nm, pts in per_nat.items():
        n = len(pts)
        sx = sum(m for m, _ in pts)
        sy = sum(r for _, r in pts)
        sxx = sum(m * m for m, _ in pts)
        sxy = sum(m * r for m, r in pts)
        slope = ((n * float(sxy) - float(sx) * float(sy))
                 / (n * float(sxx) - float(sx) * float(sx)))
        intercept = (float(sy) - slope * float(sx)) / n
        out.append({"nation": nm, "n_months": n,
                    "slope_per_month": rnd(slope / 100.0, 4),
                    "intercept": rnd(intercept / 100.0, 4)})
    assert_equal(spark, "q_group_trend", out)


def test_replay_q_simpson_flip(spark):
    pts: dict = defaultdict(list)
    for li in rows("lineitem"):
        pts[li["l_returnflag"]].append(
            (_round_cents(li["l_discount"]), int(li["l_quantity"])))
    pooled = [p for v in pts.values() for p in v]
    cp = _pearson(pooled)
    out = []
    for f, v in pts.items():
        cg = _pearson(v)
        out.append({
            "stratum": f, "n_rows": len(v),
            "corr_group": rnd(cg, 6) if cg is not None else None,
            "corr_pooled": rnd(cp, 6) if cp is not None else None,
            "sign_flipped": 1 if (cg is not None and cp is not None
                                  and cg * cp < 0) else 0,
        })
    assert_equal(spark, "q_simpson_flip", out)


def test_replay_q_dataset_mix(spark):
    agg: dict = defaultdict(lambda: [0, 0])
    for d in rows("documents"):
        rate = 200 + 50 * (int(d["source"][3:]) % 10)
        a = agg[(d["source"], rate)]
        a[0] += 1
        if _bucket("mix", d["doc_id"]) < rate:
            a[1] += 1
    assert_equal(spark, "q_dataset_mix", [
        {"source": k[0], "rate_permille": k[1], "n_docs": v[0],
         "n_kept": v[1]}
        for k, v in agg.items()
    ])


def test_replay_q_train_test_split(spark):
    agg: dict = defaultdict(int)
    for d in rows("documents"):
        b = _bucket("split", d["doc_id"])
        split = "train" if b < 800 else ("val" if b < 900 else "test")
        agg[(d["lang"], split)] += 1
    assert_equal(spark, "q_train_test_split", [
        {"lang": k[0], "split": k[1], "n_docs": v} for k, v in agg.items()
    ])


def test_replay_q_weighted_sample(spark):
    nib = "0123456789abcdef"
    keyed = []
    for d in rows("documents"):
        h = _md5(f"wrs:{d['doc_id']}")
        h32 = int(h[:8], 16)
        assert sum(nib.index(c) * 16 ** (7 - i)
                   for i, c in enumerate(h[:8])) == h32
        ikey = int(Decimal(str(
            -math.log((h32 + 1) / 4294967297.0)
            / max(d["n_chars"], 1) * 1_000_000_000
        )).quantize(Decimal(1), rounding=ROUND_HALF_UP))
        keyed.append((ikey, d["doc_id"], d["n_chars"]))
    keyed.sort(key=lambda p: (p[0], p[1]))
    assert_equal(spark, "q_weighted_sample", [
        {"doc_id": doc, "n_chars": nc} for _, doc, nc in keyed[:100]
    ])


def test_replay_q_dataset_card(spark):
    agg: dict = defaultdict(lambda: [0, set(), 0])
    for d in rows("documents"):
        a = agg[(d["source"], d["lang"])]
        a[0] += 1
        a[1].add(_md5(d["text"]))
        # raw-text whitespace tokens (NOT lowercased)
        a[2] += len([t for t in d["text"].split(" ") if t != ""])
    assert_equal(spark, "q_dataset_card", [
        {"source": k[0], "lang": k[1], "n_docs": v[0],
         "n_distinct_texts": len(v[1]), "total_tokens": v[2],
         "avg_tokens": rnd(v[2] / v[0], 4)}
        for k, v in agg.items()
    ])


def test_replay_q_decontaminate(spark):
    docs = rows("documents")
    sh: dict = {}
    cnt: dict = defaultdict(int)
    for d in docs:
        s = set(_shingles(_toks(d["text"]), 8))
        sh[d["doc_id"]] = s
        for g in s:
            cnt[g] += 1
    hot = {g for g, c in cnt.items() if c > 1000}
    split = {}
    for d in docs:
        b = _bucket("split", d["doc_id"])
        split[d["doc_id"]] = ("train" if b < 800
                              else ("val" if b < 900 else "test"))
    test_docs_of: dict = defaultdict(set)
    for doc, s in sh.items():
        if split[doc] == "test":
            for g in s - hot:
                test_docs_of[g].add(doc)
    out = []
    for doc, s in sh.items():
        if split[doc] != "train":
            continue
        shared = {g for g in s - hot if g in test_docs_of}
        if not shared:
            continue
        tdocs = set()
        for g in shared:
            tdocs |= test_docs_of[g]
        out.append({"doc_id": doc, "n_shared_shingles": len(shared),
                    "n_test_docs": len(tdocs)})
    assert_equal(spark, "q_decontaminate", out)


# ---------------------------------------------------------------------------
# Similarity / cell / tokenizer / packing / classifier plans
# ---------------------------------------------------------------------------


def test_replay_q_lsh_ann(spark):
    import re

    from mapreduce_server_development_spark.plans import ORACLE

    # the +/-1 plane matrix is a literal in the oracle — parse the
    # spec rather than importing the implementation's constant
    planes = [
        [float(x) for x in m.split(",")]
        for m in re.findall(r"\[([-0-9., ]+)\]::DOUBLE\[\]",
                            ORACLE["q_lsh_ann"])
    ]
    assert len(planes) == 8 and all(len(p) == 64 for p in planes)
    embs = {e["vec_id"]: [float(x) for x in e["embedding"]]
            for e in rows("embeddings")}
    nrm = {k: math.sqrt(sum(x * x for x in v)) for k, v in embs.items()}

    def bucket(v):
        return "".join(
            "1" if rnd(sum(a * b for a, b in zip(v, p)), 6) > 0 else "0"
            for p in planes)
    bk = {vid: bucket(v) for vid, v in embs.items()}
    out = []
    for qid in sorted(k for k in embs if k <= 5):
        cands = [
            (rnd(sum(a * b for a, b in zip(embs[qid], embs[v]))
                 / (nrm[qid] * nrm[v]), 4), v)
            for v in embs if v != qid and bk[v] == bk[qid]
        ]
        cands.sort(key=lambda p: (-p[0], p[1]))
        for rk, (cos, vid) in enumerate(cands[:3], start=1):
            out.append({"query_id": qid, "vec_id": vid, "cosine": cos,
                        "rank": rk})
    assert_equal(spark, "q_lsh_ann", out)


def _minhash_sigs(w: int = 3):
    sh = {d["doc_id"]: set(_shingles(_toks(d["text"]), w))
          for d in rows("documents")}
    sig = {doc: [min(_md5(f"{seed}#{g}") for g in s)
                 for seed in range(16)]
           for doc, s in sh.items() if s}
    return sh, sig


def _band_cands(sig, rows_per_band: int):
    bands: dict = defaultdict(list)
    n_bands = 16 // rows_per_band
    for doc, s in sig.items():
        for band in range(n_bands):
            bh = _md5("".join(
                s[band * rows_per_band:(band + 1) * rows_per_band]))
            bands[(band, bh)].append(doc)
    cands = set()
    for docs_ in bands.values():
        ds = sorted(docs_)
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                cands.add((a, b))
    return cands


def test_replay_q_lsh_tuning(spark):
    _, sig = _minhash_sigs()
    docs = sorted(sig)
    truth = set()
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            if sum(1 for s in range(16) if sig[a][s] == sig[b][s]) >= 12:
                truth.add((a, b))
    out = []
    for rpb in (1, 2, 4):
        cands = _band_cands(sig, rpb)
        caught = len(cands & truth)
        out.append({
            "rows_per_band": rpb, "n_bands": 16 // rpb,
            "n_candidates": len(cands), "n_true_caught": caught,
            "n_true": len(truth),
            "recall": 1.0 if not truth else rnd(caught / len(truth), 6),
        })
    assert_equal(spark, "q_lsh_tuning", out)


def test_replay_q_minhash_estimate_audit(spark):
    sh, sig = _minhash_sigs()
    out = []
    for a, b in _band_cands(sig, 2):
        n_match = sum(1 for s in range(16) if sig[a][s] == sig[b][s])
        ni = len(sh[a] & sh[b])
        est = rnd(n_match / 16, 4)
        jac = rnd(ni / (len(sh[a]) + len(sh[b]) - ni), 4)
        out.append({"doc_a": a, "doc_b": b, "n_match": n_match,
                    "est_jaccard": est, "jaccard": jac,
                    "est_error": rnd(abs(est - jac), 4)})
    assert_equal(spark, "q_minhash_estimate_audit", out)


def test_replay_q_label_purity(spark):
    es = rows("embeddings")
    embs = {e["vec_id"]: [float(x) for x in e["embedding"]] for e in es}
    label = {e["vec_id"]: e["label"] for e in es}
    nrm = {k: math.sqrt(sum(x * x for x in v)) for k, v in embs.items()}

    def ccos(a, b):
        return rnd(sum(x * y for x, y in zip(embs[a], embs[b]))
                   / (nrm[a] * nrm[b]), 4)
    cents = sorted(k for k in embs if k <= 16)
    assign = {}
    for vid in embs:
        best = min(((-ccos(vid, c), c) for c in cents))
        assign[vid] = best[1]
    members: dict = defaultdict(list)
    for vid, cid in assign.items():
        members[cid].append(vid)
    agg: dict = defaultdict(lambda: [0, 0])
    for vid, cid in assign.items():
        nbrs = [(-ccos(vid, b), b) for b in members[cid] if b != vid]
        if not nbrs:
            continue  # inner join drops cells of one
        nb = min(nbrs)[1]
        a = agg[label[vid]]
        a[0] += 1
        if label[nb] == label[vid]:
            a[1] += 1
    assert_equal(spark, "q_label_purity", [
        {"label": lb, "n_vecs": v[0], "n_pure": v[1],
         "purity": rnd(v[1] / v[0], 4)}
        for lb, v in agg.items()
    ])


def test_replay_q_mix_planner(spark):
    agg: dict = defaultdict(lambda: [0, 0, 0])
    for d in rows("documents"):
        toks = _toks(d["text"])
        a = agg[d["source"]]
        a[0] += 1
        a[1] += len(toks)
        a[2] += len(set(toks))
    ranked = sorted(
        ((1_000_000 * a[2] // a[1], s, a) for s, a in agg.items()
         if a[1] > 0),
        key=lambda p: (-p[0], p[1]))
    budget = sum(a[1] for a in agg.values()) // 2
    out = []
    cum = 0
    for rk, (q, s, a) in enumerate(ranked, start=1):
        out.append({"source": s, "rank": rk, "n_docs": a[0],
                    "avail_tokens": a[1], "quality_e6": q,
                    "alloc_tokens": max(0, min(a[1], budget - cum))})
        cum += a[1]
    assert_equal(spark, "q_mix_planner", out)


def test_replay_q_logreg_gd(spark):
    d = [([float(e["embedding"][0]), float(e["embedding"][1]),
           float(e["embedding"][2])],
          0.0 if e["label"] % 2 == 0 else 1.0)
         for e in rows("embeddings")]
    n = float(len(d))
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(5):
        g = [0.0, 0.0, 0.0, 0.0]
        for x, y in d:
            p = 1.0 / (1.0 + math.exp(-(w[0] + w[1] * x[0]
                                        + w[2] * x[1] + w[3] * x[2])))
            g[0] += p - y
            g[1] += (p - y) * x[0]
            g[2] += (p - y) * x[1]
            g[3] += (p - y) * x[2]
        w = [w[i] - g[i] / n for i in range(4)]
    wr = [rnd(v, 4) for v in w]
    n_right = sum(
        1 for x, y in d
        if (1.0 if 1.0 / (1.0 + math.exp(-(wr[0] + wr[1] * x[0]
                                           + wr[2] * x[1] + wr[3] * x[2])))
            >= 0.5 else 0.0) == y
    )
    assert_equal(spark, "q_logreg_gd", [{
        "bias": rnd(w[0], 4), "c1": rnd(w[1], 4), "c2": rnd(w[2], 4),
        "c3": rnd(w[3], 4), "n_correct": n_right, "n_rows": len(d),
    }])


def test_replay_q_quality_classifier(spark):
    import re
    agg: dict = defaultdict(lambda: [0, 0])
    stops = {"the", "and", "of", "to", "in", "is", "for", "on",
             "with", "as"}
    for d in rows("documents"):
        low = d["text"].lower()
        toks = _toks(d["text"])
        n_ws = len(toks)
        n_alpha = len(re.findall(r"[a-z]+", low))
        n_num = len(re.findall(r"[0-9]+", low))
        n_stop = sum(1 for t in toks if t in stops)
        score = int(Decimal(str(
            (40.0 * n_ws + 25.0 * n_alpha - 30.0 * n_num + 10.0 * n_stop)
            * 1000.0 / d["n_chars"]
        )).quantize(Decimal(1), rounding=ROUND_HALF_UP))
        cls = ("high" if score >= 9000
               else ("medium" if score >= 7000 else "low"))
        a = agg[(d["source"], cls)]
        a[0] += 1
        a[1] += score
    assert_equal(spark, "q_quality_classifier", [
        {"source": k[0], "quality_class": k[1], "n_docs": v[0],
         "avg_score_milli": rnd(v[1] / v[0], 4)}
        for k, v in agg.items()
    ])


def test_replay_q_bpe_encode(spark):
    wfreq: dict = defaultdict(int)
    for d in rows("documents"):
        for t in _toks(d["text"]):
            wfreq[t] += 1
    seqs = {w: list(w) + ["</w>"] for w in wfreq}
    for _ in range(6):
        pc: dict = defaultdict(int)
        for w, s in seqs.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += wfreq[w]
        if not pc:
            break
        best = min(((-c, a, b) for (a, b), c in pc.items()))
        first, second = best[1], best[2]
        for w, s in seqs.items():
            out = []
            for t in s:
                if out and out[-1] == first and t == second:
                    out[-1] = first + second
                else:
                    out.append(t)
            seqs[w] = out
    n_sub = {w: len(s) - 1 for w, s in seqs.items()}
    out_rows = []
    for d in rows("documents"):
        toks = _toks(d["text"])
        out_rows.append({
            "doc_id": d["doc_id"], "n_words": len(toks),
            "n_subwords": sum(n_sub[t] for t in toks),
        })
    assert_equal(spark, "q_bpe_encode", out_rows)


def test_replay_q_seq_packing(spark):
    docs = sorted(rows("documents"), key=lambda d: d["doc_id"])
    out = []
    cum = 0
    for d in docs:
        nt = len([t for t in d["text"].split(" ") if t != ""])
        out.append({"doc_id": d["doc_id"], "n_tokens": nt,
                    "seq_bin": cum // 2048,
                    "bin_offset": cum - (cum // 2048) * 2048})
        cum += nt
    assert_equal(spark, "q_seq_packing", out)


def test_replay_q_udtf_chunk(spark):
    out = []
    for d in rows("documents"):
        toks = _toks(d["text"])
        for i in range(math.ceil(len(toks) / 32)):
            out.append({
                "doc_id": d["doc_id"], "chunk_id": i,
                "chunk_len": min(32, len(toks) - i * 32),
                "first_token": toks[i * 32],
            })
    assert_equal(spark, "q_udtf_chunk", out)


def test_replay_q_dup_clusters_star(spark):
    """The star-contraction implementation must produce the identical
    min-id component labeling as the BFS reference."""
    pairs, _ = _jaccard_pairs(5, 0.2)
    cluster = _components(pairs)
    assert_equal(spark, "q_dup_clusters_star", [
        {"doc_id": doc, "cluster_id": c} for doc, c in cluster.items()
    ])


def test_replay_q_multimodal_metadata(spark):
    import binascii
    out = []
    for d in rows("documents"):
        magic = ("IMG1", "AUD1", "VID1")[d["doc_id"] % 3]
        w = 16 + d["doc_id"] % 48
        h = 16 + (d["doc_id"] * 7) % 48
        media = f"{magic}:{w}x{h}:{d['text']}".encode()
        out.append({
            "doc_id": d["doc_id"], "n_bytes": len(media),
            "content_hash": _md5(
                binascii.hexlify(media).decode().upper()),
            "magic": magic,
            "modality": {"IMG1": "image", "AUD1": "audio",
                         "VID1": "video"}[magic],
        })
    assert_equal(spark, "q_multimodal_metadata", out)


def test_replay_q_tensor_stats(spark):
    out = []
    for e in rows("embeddings"):
        vv = [float(x) for x in e["embedding"]]
        out.append({
            "vec_id": e["vec_id"], "n_dims": len(vv),
            "l2_norm": rnd(math.sqrt(sum(x * x for x in vv)), 4),
            "mean": rnd(sum(vv) / len(vv), 4),
            "vmin": rnd(min(vv), 4), "vmax": rnd(max(vv), 4),
        })
    assert_equal(spark, "q_tensor_stats", out)


def test_replay_q_hot_cell_split(spark):
    embs = {e["vec_id"]: [float(x) for x in e["embedding"]]
            for e in rows("embeddings")}
    nrm = {k: math.sqrt(sum(x * x for x in v)) for k, v in embs.items()}
    n = len(embs)
    k = math.ceil(math.sqrt(n))
    cents = sorted(embs)[:k]

    def ccos(a, c):
        return rnd(sum(x * y for x, y in zip(embs[a], embs[c]))
                   / (nrm[a] * nrm[c]), 4)
    assign = {vid: min(((-ccos(vid, c), c) for c in cents))[1]
              for vid in embs}
    cellcnt: dict = defaultdict(int)
    for cid in assign.values():
        cellcnt[cid] += 1
    sub = {vid: vid % math.ceil(cellcnt[cid] / (0.25 * k))
           for vid, cid in assign.items()}
    subcnt: dict = defaultdict(int)
    for vid, cid in assign.items():
        subcnt[(cid, sub[vid])] += 1
    assert_equal(spark, "q_hot_cell_split", [{
        "n_cells": len(cellcnt), "n_subcells": len(subcnt),
        "max_cell": max(cellcnt.values()),
        "max_subcell": max(subcnt.values()),
        "pairs_uncapped": sum(c * (c - 1) for c in cellcnt.values()),
        "pairs_capped": sum(c * (c - 1) for c in subcnt.values()),
        "pairs_joined": sum(c * (c - 1) for c in subcnt.values()),
    }])


# ---------------------------------------------------------------------------
# IVF / multiprobe / quantizer-train / media-plumbing / pipeline plans
# ---------------------------------------------------------------------------


def _emb_cos():
    embs = {e["vec_id"]: [float(x) for x in e["embedding"]]
            for e in rows("embeddings")}
    nrm = {k: math.sqrt(sum(x * x for x in v)) for k, v in embs.items()}

    def ccos(a, b):
        return rnd(sum(x * y for x, y in zip(embs[a], embs[b]))
                   / (nrm[a] * nrm[b]), 4)
    return embs, nrm, ccos


def test_replay_q_ivf_ann(spark):
    embs, nrm, ccos = _emb_cos()
    cents = sorted(k for k in embs if k <= 16)
    assign = {vid: min(((-ccos(vid, c), c) for c in cents))[1]
              for vid in embs}
    out = []
    for qid in sorted(k for k in embs if k <= 5):
        probed = [c for _, c in sorted((-ccos(qid, c), c) for c in cents)[:2]]
        cands = {v for v, c in assign.items() if c in probed and v != qid}
        ranked = sorted(((ccos(qid, v), v) for v in cands),
                        key=lambda p: (-p[0], p[1]))
        for rk, (cos, vid) in enumerate(ranked[:3], start=1):
            out.append({"query_id": qid, "vec_id": vid, "cosine": cos,
                        "rank": rk})
    assert_equal(spark, "q_ivf_ann", out)


def test_replay_q_lsh_ann_multiprobe(spark):
    import re

    from mapreduce_server_development_spark.plans import ORACLE

    planes = [
        [float(x) for x in m.split(",")]
        for m in re.findall(r"\[([-0-9., ]+)\]::DOUBLE\[\]",
                            ORACLE["q_lsh_ann_multiprobe"])
    ]
    assert len(planes) == 4
    embs, nrm, ccos = _emb_cos()

    def bucket(v):
        return "".join(
            "1" if rnd(sum(a * b for a, b in zip(v, p)), 6) > 0 else "0"
            for p in planes)
    bk = {vid: bucket(v) for vid, v in embs.items()}
    out = []
    for qid in sorted(k for k in embs if k <= 5):
        qb = bk[qid]
        probes = {qb} | {
            qb[:i] + ("1" if qb[i] == "0" else "0") + qb[i + 1:]
            for i in range(4)
        }
        cands = {v for v in embs if v != qid and bk[v] in probes}
        ranked = sorted(((ccos(qid, v), v) for v in cands),
                        key=lambda p: (-p[0], p[1]))
        for rk, (cos, vid) in enumerate(ranked[:3], start=1):
            out.append({"query_id": qid, "vec_id": vid, "cosine": cos,
                        "rank": rk})
    assert_equal(spark, "q_lsh_ann_multiprobe", out)


def test_replay_q_cell_quantizer_train(spark):
    embs, _, _ = _emb_cos()
    n = len(embs)
    k = math.ceil(math.sqrt(n))
    dims = len(next(iter(embs.values())))

    def norm(v):
        return math.sqrt(sum(x * x for x in v))

    def argmax(cents):
        assign = {}
        for vid, v in embs.items():
            nv = norm(v)
            best = min(
                (-rnd(sum(a * b for a, b in zip(v, cv)) / (nv * cn), 4), cid)
                for cid, (cv, cn) in cents.items()
            )
            assign[vid] = (best[1], -best[0])
        return assign

    def refit(assign):
        members: dict = defaultdict(list)
        for vid, (cid, _) in assign.items():
            members[cid].append(embs[vid])
        cents = {}
        for cid, vs in members.items():
            cv = [float(rnd(sum(v[i] for v in vs) / len(vs), 6))
                  for i in range(dims)]
            cents[cid] = (cv, norm(cv))
        return cents

    cents0 = {c: (embs[c], norm(embs[c])) for c in sorted(embs)[:k]}
    stages = [argmax(cents0)]
    for _ in range(2):
        stages.append(argmax(refit(stages[-1])))
    out = []
    prev = None
    for st, assign in enumerate(stages):
        cnt: dict = defaultdict(int)
        for cid, _ in assign.values():
            cnt[cid] += 1
        s_e4 = sum(
            int(Decimal(str(c * 10000)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP))
            for _, c in assign.values())
        moved = (0 if prev is None else sum(
            1 for vid in assign if assign[vid][0] != prev[vid][0]))
        out.append({"stage": st, "n_cells": len(cnt),
                    "max_cell": max(cnt.values()),
                    "sum_ccos_e4": s_e4, "n_moved": moved})
        prev = assign
    assert_equal(spark, "q_cell_quantizer_train", out)


def test_replay_q_frame_sample(spark):
    out = []
    for d in rows("documents"):
        if d["doc_id"] % 3 != 2:
            continue
        for f in range(0, 8 + d["doc_id"] % 16, 4):
            out.append({"doc_id": d["doc_id"], "frame_idx": f})
    assert_equal(spark, "q_frame_sample", out)


def test_replay_q_image_patches(spark):
    out = []
    for d in rows("documents"):
        if d["doc_id"] % 3 != 0:
            continue
        w = 16 + d["doc_id"] % 48
        h = 16 + (d["doc_id"] * 7) % 48
        nr, nc = math.ceil(h / 16.0), math.ceil(w / 16.0)
        for p in range(nr * nc):
            out.append({"doc_id": d["doc_id"], "patch_row": p // nc,
                        "patch_col": p % nc, "x0": (p % nc) * 16,
                        "y0": (p // nc) * 16})
    assert_equal(spark, "q_image_patches", out)


def test_replay_q_media_decode(spark):
    out = []
    for d in rows("documents"):
        out.append({
            "doc_id": d["doc_id"],
            "modality": ("IMG1", "AUD1", "VID1")[d["doc_id"] % 3],
            "width": 16 + d["doc_id"] % 48,
            "height": 16 + (d["doc_id"] * 7) % 48,
            "n_payload_bytes": len(d["text"].encode()),
        })
    assert_equal(spark, "q_media_decode", out)


def test_replay_q_pipeline_e2e(spark):
    docs = rows("documents")
    keep: dict = {}
    for d in docs:
        h = _md5(d["text"])
        if h not in keep or d["doc_id"] < keep[h]:
            keep[h] = d["doc_id"]
    clean = sorted(
        (d for d in docs if keep[_md5(d["text"])] == d["doc_id"]),
        key=lambda d: d["doc_id"])
    out = []
    cum = 0
    for d in clean:
        nt = len([t for t in d["text"].split(" ") if t != ""])
        b = _bucket("split", d["doc_id"])
        split = "train" if b < 800 else ("val" if b < 900 else "test")
        seq_bin = None
        if split == "train":
            seq_bin = cum // 2048
            cum += nt
        out.append({"doc_id": d["doc_id"], "split": split,
                    "n_tokens": nt, "seq_bin": seq_bin})
    assert_equal(spark, "q_pipeline_e2e", out)


def test_replay_q_media_decode_real(spark):
    """The REAL stdlib codec round-trip (PNG chunk-walk/inflate, BMP,
    PPM — encoded and decoded inside the query) must land exactly on
    the analytically-known pixel sums of the synthetic gradient."""
    out = []
    for d in rows("documents"):
        did = d["doc_id"]
        w, h = 4 + did % 9, 4 + (did * 3) % 7
        fmt = ("png", "bmp", "ppm")[did % 3]
        channels = 1 if did % 3 == 0 else 3
        gsum = sum((did + 3 * x + 7 * y) % 256
                   for x in range(w) for y in range(h))
        out.append({"doc_id": did, "fmt": fmt, "width": w, "height": h,
                    "channels": channels, "pixel_sum": channels * gsum})
    assert_equal(spark, "q_media_decode_real", out)


def test_replay_q_session_window(spark):
    """Native session_window(30 min) must equal the hand-rolled
    gaps-and-islands sessionization (end = last event + 30 min)."""
    from datetime import timedelta
    out = []
    for u, ses in _sessions_30min():
        out.append({
            "user_id": u,
            "session_start": min(e["ts"] for e in ses)
            .strftime("%Y-%m-%d %H:%M:%S"),
            "session_end": (max(e["ts"] for e in ses)
                            + timedelta(minutes=30))
            .strftime("%Y-%m-%d %H:%M:%S"),
            "n_events": len(ses),
        })
    assert_equal(spark, "q_session_window", out)
