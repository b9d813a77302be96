"""Fault injection: a worker process dying mid-pipeline must not lose or
duplicate rows — Ray reschedules the dead task and the lineage re-executes
exactly the lost blocks. This is the in-flight half of the resume story
(the flagship manifest covers the across-run half)."""

import os

import numpy as np
import pyarrow as pa


def test_worker_death_retries_and_conserves(ray_session, tmp_path):
    import ray.data

    from plateau_gis_converter_ray.sources.tables import read_table

    marker = str(tmp_path / "died_once")

    def flaky(batch: pa.Table) -> pa.Table:
        # exactly one task, across all workers and retries, dies hard
        # (os._exit: a real process death, not a Python exception) — the
        # file-create is atomic, so only the first task takes the hit
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            os._exit(1)
        except FileExistsError:
            pass
        v = np.round(batch.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table(
            {"event_id": batch.column("event_id"), "value_c": pa.array(v)}
        )

    sf = "/root/testdata/sf0.001"
    ds = read_table(sf, "events", ["event_id", "value"]).map_batches(
        flaky, batch_format="pyarrow"
    )
    got = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert os.path.exists(marker)  # the death actually happened

    import pandas as pd

    exp = pd.read_parquet(f"{sf}/events.parquet", columns=["event_id", "value"])
    exp = (
        exp.assign(value_c=np.round(exp["value"].to_numpy() * 100).astype(np.int64))
        .drop(columns=["value"])
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)  # no loss, no duplication
