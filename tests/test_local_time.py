"""q82 local-time rollup and q83 per-zone quota cap: crafted pins.

The DuckDB oracle pins full values at sf0.01; these tests pin the two
pieces a value hash can mask — the solar-offset rule itself and the
quota-cap invariants — at sf0.001 for speed.
"""

import pandas as pd
from pyspark.sql import functions as F

from tzspark.queries_extra import (
    _ZONE_QUOTA,
    _q41_assigned,
    q82_local_time_rollup,
    q83_zone_quota_sample,
)

SF = "/root/testdata/sf0.001"


def test_q82_solar_offset_localizes_hours(spark):
    out = q82_local_time_rollup(spark, SF).toPandas()
    _a, dim = _q41_assigned(spark, SF)
    d = dim.toPandas().set_index("zone_id")
    # recompute the rollup independently in pandas: join events ts, shift
    # by round(center_lng/15) hours, count per (zone, local hour)
    a = _a.select(
        "zone_id", F.substring("image_id", 4, 12).cast("long").alias("event_id")
    )
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "ts")
    j = a.join(ev, "event_id").toPandas()
    d["off"] = ((d["min_lng"] + d["max_lng"]) / 2.0 / 15.0).round().astype(int)
    j["local_hour"] = (
        pd.to_datetime(j["ts"])
        + pd.to_timedelta(d.loc[j["zone_id"], "off"].to_numpy(), unit="h")
    ).dt.hour
    want = (
        j.groupby(["zone_id", "local_hour"]).size().rename("n_images").reset_index()
    )
    got = out[["zone_id", "local_hour", "n_images"]]
    m = got.merge(want, on=["zone_id", "local_hour"], suffixes=("_got", "_want"))
    assert len(m) == len(got) == len(want)
    assert (m["n_images_got"] == m["n_images_want"]).all()
    # zones with a nonzero offset must exist or the test proves nothing
    assert (d.loc[out["zone_id"].unique(), "off"] != 0).any()


def test_q83_quota_invariants_and_determinism(spark):
    out = q83_zone_quota_sample(spark, SF).toPandas()
    assert out["image_id"].is_unique
    per = out.groupby("zone_id")
    # rank is a dense 1..n permutation inside every zone
    for _z, g in per:
        assert sorted(g["rk"]) == list(range(1, len(g) + 1))
    assert (out["kept"] == (out["rk"] <= _ZONE_QUOTA)).all()
    kept = out[out["kept"]].groupby("zone_id").size()
    assert (kept <= _ZONE_QUOTA).all()
    # a second run orders identically (content-hash rank, no RNG state)
    again = q83_zone_quota_sample(spark, SF).toPandas()
    assert out.equals(again)
