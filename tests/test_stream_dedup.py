"""Exactly-once streaming dedup: replay counts, totals == clean batch."""

import numpy as np
import pandas as pd


def test_stream_dedup_exactly_once(ray_session):
    from plateau_gis_converter_ray.kernels.imagecodec import splitmix64
    from plateau_gis_converter_ray.stages.streaming import stream_dedup_totals

    sf = "/root/testdata/sf0.001"
    got = stream_dedup_totals(sf)

    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_id", "user_id", "value"])
    with np.errstate(over="ignore"):
        h = splitmix64(ev["event_id"].to_numpy().astype(np.uint64))
    n_replayed = int(((h % np.uint64(3)) == 0).sum())
    # exactly the replays were dropped, exactly the originals admitted
    assert got.attrs["dropped"] == n_replayed
    assert got.attrs["admitted"] == len(ev)

    exp = (
        ev.assign(value_c=np.round(ev["value"].to_numpy() * 100).astype(np.int64))
        .groupby("user_id", as_index=False)
        .agg(n=("value_c", "size"), sum_value_c=("value_c", "sum"))
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["user_id", "n", "sum_value_c"]].astype(exp.dtypes.to_dict()), exp
    )
