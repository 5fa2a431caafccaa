"""Round-4ar extension operators (SURVEY.md §2.58): semantic
invariants beyond the oracle hash — SPC rules vs numpy z-scores,
UUID spec-validity, apportionment conservation."""

from __future__ import annotations

import math
import re
import uuid as uuidlib

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2

_UUID_RE = re.compile(
    r"^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
)


def test_spc_rules_match_numpy(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["agg_spc_rules"](spark, SF_T2)
        .toPandas()
        .set_index("event_type")
    )
    ev = t(spark, SF_T2, "events").toPandas()
    ev["cents"] = (ev["value"] * 100 + 0.5).astype("int64")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    for et, g in ev.groupby("event_type"):
        x = g.groupby("d")["cents"].sum().sort_index().to_numpy(float)
        mu, sd = x.mean(), x.std(ddof=1)
        z = (x - mu) / sd
        rule1 = int((np.abs(z) > 3).sum())
        side = np.where(z > 2, 1, np.where(z < -2, -1, 0))
        rule2 = 0
        for i in range(len(side)):
            s3 = side[max(0, i - 2) : i + 1]
            pad = np.zeros(3 - len(s3))
            s3 = np.concatenate([pad, s3])
            if side[i] != 0 and abs(s3.sum()) >= 2:
                rule2 += 1
        r = got.loc[et]
        assert r["n_days"] == len(x)
        assert r["rule1_hits"] == rule1, et
        assert r["rule2_hits"] == rule2, et


def test_uuid3_spec_valid_and_stable(spark, queries):
    got = queries["fn_uuid3_mint"](spark, SF_SMOKE).toPandas()
    assert got["order_uuid"].is_unique
    for u in got["order_uuid"].head(200):
        assert _UUID_RE.match(u), u
        parsed = uuidlib.UUID(u)
        assert parsed.version == 3
        assert parsed.variant == uuidlib.RFC_4122
    # stability: re-running mints the identical ids
    again = queries["fn_uuid3_mint"](spark, SF_SMOKE).toPandas()
    assert got.sort_values("o_orderkey")["order_uuid"].tolist() == \
        again.sort_values("o_orderkey")["order_uuid"].tolist()


def test_apportionment_conserves_capacity(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["join_apportion_capacity"](spark, SF_T2).toPandas()
    o = t(spark, SF_T2, "orders").toPandas()
    assert len(got) == len(o)
    per_wk = got.groupby("week_ms").agg(
        alloc=("alloc_cents", "sum"), demand=("cents", "sum")
    )
    for _, r in per_wk.iterrows():
        assert r["alloc"] == r["demand"] * 8 // 10  # EXACT conservation
    # nobody allocated more than demanded, at most 1 cent above quota
    q = got["cents"] * 0.8
    assert (got["alloc_cents"] <= got["cents"]).all()
    assert (got["alloc_cents"] <= np.ceil(q) + 1).all()
    assert (got["alloc_cents"] >= np.floor(q) - 1).all()


def test_apportionment_matches_hamilton(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["join_apportion_capacity"](spark, SF_SMOKE).toPandas()
    o = t(spark, SF_SMOKE, "orders").toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    o["wk"] = (
        pd.to_datetime(o["o_orderdate"])
        .dt.to_period("W")
        .dt.start_time
    )
    m = got.set_index("o_orderkey")["alloc_cents"]
    for wk, g in o.groupby("wk"):
        demand = int(g["cents"].sum())
        cap = demand * 8 // 10
        quotas = [
            (k, c * cap // demand, c * cap % demand)
            for k, c in zip(g["o_orderkey"], g["cents"])
        ]
        shortfall = cap - sum(q for _, q, _ in quotas)
        topup = {
            k
            for k, _, _ in sorted(
                quotas, key=lambda x: (-x[2], x[0])
            )[:shortfall]
        }
        for k, q, _ in quotas:
            assert m[k] == q + (1 if k in topup else 0), (wk, k)
