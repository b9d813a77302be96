"""Hilbert-clustered parquet layout: pruning effect + content parity."""

from __future__ import annotations

import glob

import pandas as pd


def test_clustered_layout_prunes_row_groups(ray_session, tmp_path):
    from plateau_gis_converter_ray.sinks.layout import (
        row_groups_scanned,
        write_clustered_events,
        write_unclustered_events,
    )

    sf = "/root/testdata/sf0.01"
    clustered = write_clustered_events(
        sf, str(tmp_path / "clustered"), rows_per_group=512
    )
    plain = write_unclustered_events(
        sf, str(tmp_path / "plain"), rows_per_group=512
    )

    # a Tokyo-ish bbox: ~2% of the lng x lat extent the points cover
    bbox = (139.0, 141.0, 34.5, 36.5)
    hit_c, tot_c, rows_c = row_groups_scanned(clustered, *bbox)
    hit_p, tot_p, rows_p = row_groups_scanned(plain, *bbox)
    # total group counts differ (the range sort repartitions); both
    # layouts must just be non-trivially chunked
    assert tot_c > 3 and tot_p > 3
    # arrival order interleaves the whole extent -> every group matches;
    # the Hilbert sort localizes the bbox to a small fraction
    assert hit_p == tot_p
    assert hit_c * 3 <= tot_c, (hit_c, tot_c)

    # same rows either way (the sort is a permutation)
    a = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(clustered + "/*.parquet")]
    ).sort_values("event_id").reset_index(drop=True)
    b = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(plain + "/*.parquet")]
    ).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # and the pruned set is sound: the matched groups hold at least every
    # bbox row (a hit-undercounting bug would break this inequality)
    inside = a[
        a["lng"].between(bbox[0], bbox[1]) & a["lat"].between(bbox[2], bbox[3])
    ]
    assert len(inside) > 0
    assert rows_c >= len(inside)
    assert rows_p >= len(inside)
