"""CLIP-score filter (stub towers, real plumbing) + parquet compaction."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _full_image_table(sf=0.001):
    from plateau_gis_converter_ray.sources.images import ensure_image_table

    path = ensure_image_table(sf)
    return pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(path + "/*.parquet"))]
    )


def test_clip_score_distributed_equals_local(ray_session):
    from plateau_gis_converter_ray.stages.clipscore import (
        clip_score_batch,
        clip_score_filter,
    )

    got = (
        clip_score_filter(0.001)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    loc = (
        clip_score_batch(_full_image_table())
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, loc)
    # scores live in the +-1-tower cosine range and the filter is
    # non-trivial in both directions
    assert got["clip_score_e6"].between(-1_000_000, 1_000_000).all()
    assert 0 < got["kept"].sum() < len(got)


def test_clip_towers_separate_modalities():
    """Planted pixel-duplicates (idx%10==9 copies idx-1's pixels but keeps
    its own caption): image tower must match the source row, text tower
    must differ — the towers read only their own modality."""
    from plateau_gis_converter_ray.stages.clipscore import (
        image_tower,
        text_tower,
    )

    t = _full_image_table()
    ids = np.array([int(s[4:]) for s in t.column("image_id").to_pylist()])
    img = image_tower(t)
    txt = text_tower(t.column("caption"))
    dup = np.flatnonzero(ids % 10 == 9)
    assert len(dup) > 0
    src = dup - 1
    assert (img[dup] == img[src]).all()
    # captions are distinct per row -> at least one text tower disagrees
    assert (txt[dup] != txt[src]).any()


def test_compact_parquet_dir(ray_session, tmp_path):
    from plateau_gis_converter_ray.sinks.compact import (
        compact_parquet_dir,
        plan_bins,
    )

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.RandomState(11)
    n_files, rows_per = 24, 100
    for i in range(n_files):
        df = pd.DataFrame(
            {
                "k": np.arange(i * rows_per, (i + 1) * rows_per),
                "v": rng.randint(0, 1000, rows_per),
            }
        )
        df.to_parquet(src / f"part_{i:04d}.parquet", index=False)

    sizes = [os.stat(src / f).st_size for f in os.listdir(src)]
    target = sum(sizes) // 4 + max(sizes)
    bins = plan_bins(str(src), target)
    assert plan_bins(str(src), target) == bins  # deterministic
    assert sum(len(b) for b in bins) == n_files
    for b in bins:
        tot = sum(os.stat(src / f).st_size for f in b)
        assert len(b) == 1 or tot <= target

    out = tmp_path / "out"
    res = compact_parquet_dir(str(src), str(out), target)
    assert res["compacted"] == res["bins"] == len(bins)
    assert res["skipped"] == 0

    out_files = sorted(glob.glob(str(out / "part=*" / "data.parquet")))
    assert 0 < len(out_files) < n_files

    before = pd.concat(
        [pd.read_parquet(src / f) for f in os.listdir(src)]
    ).sort_values(["k"]).reset_index(drop=True)
    after = pd.concat(
        [pd.read_parquet(f) for f in out_files]
    ).sort_values(["k"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)

    # resume: second run is a no-op (bins skipped, bytes untouched)
    mtimes = {f: os.stat(f).st_mtime_ns for f in out_files}
    res2 = compact_parquet_dir(str(src), str(out), target)
    assert res2["compacted"] == 0 and res2["skipped"] == len(bins)
    assert {f: os.stat(f).st_mtime_ns for f in out_files} == mtimes

    # crash-resume: a kill before the atomic rename leaves NO partition
    # dir and NO manifest line (rename+commit are the last two steps) —
    # simulate that state for one bin; only it rebuilds
    import shutil

    victim = out_files[0]
    victim_key = victim.split("part=")[1].split("/")[0]
    manifest = out / "manifest.jsonl"
    lines = [
        ln
        for ln in manifest.read_text().splitlines()
        if json.loads(ln)["key"] != victim_key
    ]
    manifest.write_text("\n".join(lines) + "\n")
    shutil.rmtree(os.path.dirname(victim))
    res3 = compact_parquet_dir(str(src), str(out), target)
    assert res3["compacted"] == 1 and res3["skipped"] == len(bins) - 1
    survivors = [f for f in out_files if f != victim]
    assert {f: os.stat(f).st_mtime_ns for f in survivors} == {
        f: mtimes[f] for f in survivors
    }
    after3 = pd.concat(
        [pd.read_parquet(f) for f in out_files]
    ).sort_values(["k"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after3)

    # crash BETWEEN rename and manifest commit: partition dir complete,
    # manifest line missing -> the rerun recommits idempotently without
    # rewriting the (atomic) partition payload
    survivor = out_files[1]
    survivor_key = survivor.split("part=")[1].split("/")[0]
    lines = [
        ln
        for ln in manifest.read_text().splitlines()
        if json.loads(ln)["key"] != survivor_key
    ]
    manifest.write_text("\n".join(lines) + "\n")
    mtime_before = os.stat(survivor).st_mtime_ns
    res4 = compact_parquet_dir(str(src), str(out), target)
    assert res4["compacted"] == 1
    assert os.stat(survivor).st_mtime_ns == mtime_before
    keys = {json.loads(ln)["key"] for ln in manifest.read_text().splitlines()}
    assert keys == {str(i) for i in range(len(bins))}


def test_compact_resume_guards(ray_session, tmp_path):
    """The three resume-window corruption cases fail loudly / self-heal."""
    from plateau_gis_converter_ray.sinks.compact import compact_parquet_dir

    src = tmp_path / "src"
    src.mkdir()
    for i in range(8):
        pd.DataFrame({"k": np.arange(i * 50, (i + 1) * 50)}).to_parquet(
            src / f"p{i}.parquet", index=False
        )
    sizes = [os.stat(src / f).st_size for f in os.listdir(src)]
    target = sum(sizes) // 3 + max(sizes)
    out = tmp_path / "out"
    res = compact_parquet_dir(str(src), str(out), target)
    assert res["compacted"] >= 2

    # (a) committed-bin lineage mismatch after a source change -> raise:
    # blowing p0 up to many times its size reshuffles the packing of the
    # already-committed bins
    pd.DataFrame({"k": np.arange(5000)}).to_parquet(
        src / "p0.parquet", index=False
    )
    with pytest.raises(ValueError, match="resume"):
        compact_parquet_dir(str(src), str(out), target)
    pd.DataFrame({"k": np.arange(50)}).to_parquet(  # restore
        src / "p0.parquet", index=False
    )

    # (b) shrunk source: committed bins beyond the new plan -> raise
    out2 = tmp_path / "out2"
    compact_parquet_dir(str(src), str(out2), target)
    for f in list(os.listdir(src))[:6]:
        (src / f).unlink()
    with pytest.raises(ValueError, match="resume"):
        compact_parquet_dir(str(src), str(out2), target)

    # (c) rename-committed but manifest-uncommitted payload whose
    # recorded file list mismatches the plan -> rewritten, not recommitted
    src3 = tmp_path / "src3"
    src3.mkdir()
    for i in range(4):
        pd.DataFrame({"k": np.arange(i * 50, (i + 1) * 50)}).to_parquet(
            src3 / f"p{i}.parquet", index=False
        )
    out3 = tmp_path / "out3"
    compact_parquet_dir(str(src3), str(out3), 10 << 20)  # one bin
    # wipe the manifest (simulate crash before commit), change the source
    (out3 / "manifest.jsonl").unlink()
    pd.DataFrame({"k": np.arange(200, 250)}).to_parquet(
        src3 / "p4.parquet", index=False
    )
    compact_parquet_dir(str(src3), str(out3), 10 << 20)
    got = pd.concat(
        [pd.read_parquet(f) for f in
         sorted(glob.glob(str(out3 / "part=*" / "data.parquet")))]
    )
    assert set(got["k"]) == set(range(250))  # new file's rows present


def test_corpus_resume_config_guard(ray_session, tmp_path):
    from plateau_gis_converter_ray.pipelines.corpus import write_corpus_dedup

    out = str(tmp_path / "corpus")
    write_corpus_dedup("/root/testdata/sf0.001", out, n_shards=2)
    with pytest.raises(ValueError, match="config mismatch"):
        write_corpus_dedup("/root/testdata/sf0.001", out, n_shards=4)


def test_fuzzy_input_guards():
    import pytest as _pytest

    from plateau_gis_converter_ray.pipelines.queries import (
        q_fuzzy_token_join,
    )
    from plateau_gis_converter_ray.stages.fuzzy import deletion_variants

    with _pytest.raises(ValueError, match="BYTES"):
        deletion_variants(np.array(["x" * 40], dtype=object))
    with _pytest.raises(ValueError, match="sf-named"):
        q_fuzzy_token_join("/data/prod_docs")
