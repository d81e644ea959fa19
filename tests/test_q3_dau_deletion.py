"""Contract tests for TPC-H Q3 shipping priority, rolling active
users, and the deletion-impact report."""

from __future__ import annotations

import hashlib
from collections import defaultdict
from decimal import Decimal

from tests.conftest import SF_TINY


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_shipping_priority_matches_decimal_mirror(spark):
    """Top-10 revenue rows must equal an exact-Decimal Python replay
    of Q3, in order."""
    cust = {
        r["c_custkey"]
        for r in spark.read.parquet(f"{SF_TINY}/customer.parquet").collect()
        if r["c_mktsegment"] == "BUILDING"
    }
    orders = {
        r["o_orderkey"]: r
        for r in spark.read.parquet(f"{SF_TINY}/orders.parquet").collect()
        if r["o_custkey"] in cust
        and r["o_orderdate"].strftime("%Y-%m-%d") < "1998-03-15"
    }
    rev = defaultdict(Decimal)
    for r in spark.read.parquet(f"{SF_TINY}/lineitem.parquet").collect():
        if (
            r["l_orderkey"] in orders
            and r["l_shipdate"].strftime("%Y-%m-%d") > "1998-03-15"
        ):
            price = Decimal(str(round(r["l_extendedprice"], 4)))
            bp = Decimal(str(round(r["l_discount"] * 10000, 4)))
            rev[r["l_orderkey"]] += price * (10000 - bp) / 10000
    top = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    from multiomics_biocypher_kg_spark.registry import QUERIES

    got = QUERIES["rel_shipping_priority"](spark, SF_TINY).collect()
    assert len(got) == min(10, len(top))
    for g, (ok, rv) in zip(got, top):
        assert g["orderkey"] == ok
        assert abs(g["revenue"] - float(rv)) < 1e-4
        o = orders[ok]
        assert g["orderdate"] == o["o_orderdate"].strftime("%Y-%m-%d")
        assert g["orderpriority"] == o["o_orderpriority"]


def test_active_users_matches_python_windows(spark):
    """DAU/WAU must equal a Python trailing-window replay; WAU >=
    DAU and stickiness in (0, 1]."""
    import datetime as dt

    from multiomics_biocypher_kg_spark.registry import QUERIES

    ev = spark.read.parquet(f"{SF_TINY}/events.parquet").select(
        "user_id", "ts"
    ).collect()
    byday = defaultdict(set)
    for r in ev:
        byday[r["ts"].date()].add(r["user_id"])
    got = {r["day"]: r for r in QUERIES["ev_active_users"](spark, SF_TINY).collect()}
    assert set(got) == {d.strftime("%Y-%m-%d") for d in byday}
    for d, users in byday.items():
        wau = set()
        for o in range(7):
            wau |= byday.get(d - dt.timedelta(days=o), set())
        r = got[d.strftime("%Y-%m-%d")]
        assert r["dau"] == len(users)
        assert r["wau"] == len(wau)
        assert r["wau"] >= r["dau"]
        assert abs(r["stickiness"] - round(len(users) / len(wau), 6)) < 1.1e-6
        assert 0 < r["stickiness"] <= 1.0


def test_deletion_impact_matches_python_cascade(spark):
    """Affected counts per table must equal a Python cascade replay;
    lineitem's affected rows are exactly those of affected orders."""
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_scale_ops import _FORGET_MOD

    def forget(k):
        return _md5_long(str(k)) % _FORGET_MOD == 0

    cust = [r["c_custkey"] for r in spark.read.parquet(f"{SF_TINY}/customer.parquet").collect()]
    orders = [
        (r["o_orderkey"], r["o_custkey"])
        for r in spark.read.parquet(f"{SF_TINY}/orders.parquet").collect()
    ]
    aff_orders = {ok for ok, ck in orders if forget(ck)}
    li = [r["l_orderkey"] for r in spark.read.parquet(f"{SF_TINY}/lineitem.parquet").collect()]
    users = [r["user_id"] for r in spark.read.parquet(f"{SF_TINY}/events.parquet").collect()]
    expect = {
        "customer": (len(cust), sum(1 for c in cust if forget(c)), 0),
        "orders": (len(orders), len([1 for _, c in orders if forget(c)]), 1),
        "lineitem": (len(li), sum(1 for k in li if k in aff_orders), 2),
        "events": (len(users), sum(1 for u in users if forget(u)), 0),
    }
    got = {r["table_name"]: r for r in QUERIES["data_deletion_impact"](spark, SF_TINY).collect()}
    assert set(got) == set(expect)
    for t, (n, a, hop) in expect.items():
        r = got[t]
        assert r["n_total"] == n
        assert r["n_affected"] == a
        assert r["hop"] == hop
        assert abs(r["affected_pct"] - a / n) < 1.1e-6
