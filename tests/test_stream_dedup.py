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


def test_session_actor_merges_bridged_sessions(ray_session):
    """The merging-window core: two sessions 40 min apart (gap 30 min)
    must MERGE when the bridging event between them arrives LAST."""
    import tempfile

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from plateau_gis_converter_ray.stages.streaming import make_session_actor

    us = 1_000_000
    m = 60 * us
    # key 1: events at t=0 and t=40min arrive first (two separate open
    # sessions), then the bridge at t=20min arrives late
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "ts_us": pa.array([0, 40 * m, 20 * m], pa.int64()),
            "arrival_us": pa.array([0, 41 * m, 200 * m], pa.int64()),
        }
    )
    d = tempfile.mkdtemp(prefix="sess_bridge_", dir="/tmp")
    import os

    os.makedirs(os.path.join(d, "bucket=0"), exist_ok=True)
    pq.write_table(t, os.path.join(d, "bucket=0", "part.parquet"))
    SessionBucket = make_session_actor()
    a = SessionBucket.remote(30 * m, 0, 10**15)
    # batch_size=1: every event is its own micro-batch (worst case)
    assert ray.get(a.run_partition.remote(d, 0, 1)) == 3
    snap = ray.get(a.snapshot.remote())
    ray.kill(a)
    rows = pd.DataFrame(snap["sessions"])
    assert snap["late_dropped"] == 0
    assert len(rows) == 1  # ONE merged session, not three
    r = rows.iloc[0]
    assert r["start_us"] == 0 and r["end_us"] == 40 * m and r["n_events"] == 3


def test_session_windows_equal_batch_sessionize(ray_session):
    """Final snapshot == batch gaps-and-islands sessionization (the
    zero-drop configuration), independent of the driver oracle."""
    import pandas as pd

    from plateau_gis_converter_ray.pipelines.queries import q_sessionize
    from plateau_gis_converter_ray.stages.streaming import (
        stream_session_windows,
    )

    got = stream_session_windows("/root/testdata/sf0.001")
    exp = (
        q_sessionize("/root/testdata/sf0.001").to_pandas()
        .sort_values(["user_id", "start_us"])
        .reset_index(drop=True)
    )
    exp["session_idx"] = exp.groupby("user_id").cumcount() + 1
    cols = ["user_id", "session_idx", "n_events", "start_us", "end_us"]
    pd.testing.assert_frame_equal(
        got[cols].astype("int64"), exp[cols].astype("int64")
    )
