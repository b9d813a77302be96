"""End-to-end corpus-clean pipeline: staged resume + per-stage semantics."""

from __future__ import annotations

import glob
import json
import os

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _stage_docs(out_dir: str, stage: str) -> pd.DataFrame:
    files = sorted(
        glob.glob(os.path.join(out_dir, f"part={stage}",
                               "documents.parquet", "*.parquet"))
    )
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def test_text_clean_pipeline(ray_session, tmp_path):
    from plateau_gis_converter_ray.pipelines.textclean import run_text_clean

    out = str(tmp_path / "clean")
    res = run_text_clean(SF, out)
    st = res["stages"]
    # monotone shrink through the chain
    assert st["filter"]["rows_out"] <= st["filter"]["rows_in"]
    assert st["dedup"]["rows_out"] <= st["filter"]["rows_out"]
    assert st["decontam"]["rows_out"] < st["dedup"]["rows_out"]
    assert st["pack"]["rows_out"] == st["decontam"]["rows_out"]

    # dedup stage: no duplicate texts survive, and the count matches the
    # registry's keep-canonical labels
    dd = _stage_docs(out, "dedup")
    assert dd["text"].duplicated().sum() == 0
    from plateau_gis_converter_ray.pipelines.queries import q_corpus_dedup

    labels = q_corpus_dedup(SF).to_pandas()
    assert len(dd) == int(labels["kept"].sum())

    # decontam stage: survivors share no 3-gram with the eval split and
    # exclude the eval docs themselves
    from plateau_gis_converter_ray.pipelines.queries import q_contamination

    probe = q_contamination(os.path.join(out, "part=dedup")).to_pandas()
    clean = probe[(probe["n_hit"] == 0) & (probe["is_eval"] == 0)]
    dc = _stage_docs(out, "decontam")
    assert set(dc["doc_id"]) == set(clean["doc_id"])

    # packed spans cover the survivors exactly once
    pk = pd.concat(
        [pd.read_parquet(f) for f in sorted(
            glob.glob(os.path.join(out, "part=pack",
                                   "packed.parquet", "*.parquet")))],
        ignore_index=True,
    )
    assert set(pk["doc_id"]) == set(dc["doc_id"])

    # resume: full rerun is a no-op (stage payload bytes untouched)
    files = sorted(glob.glob(os.path.join(out, "part=*", "*", "*.parquet")))
    mtimes = {f: os.stat(f).st_mtime_ns for f in files}
    res2 = run_text_clean(SF, out)
    assert res2["stages"] == st
    assert {f: os.stat(f).st_mtime_ns for f in files} == mtimes

    # config mismatch fails loudly instead of resuming a different chain
    with pytest.raises(ValueError, match="config mismatch"):
        run_text_clean(SF, out, budget=128)


def test_text_clean_partial_resume(ray_session, tmp_path):
    """A run killed after stage 2 resumes at stage 3 (stages 1-2 skipped)."""
    from plateau_gis_converter_ray.pipelines.textclean import run_text_clean

    out = str(tmp_path / "clean2")
    res = run_text_clean(SF, out)
    # simulate the kill: drop the last two stage commits + their dirs
    import shutil

    manifest = os.path.join(out, "manifest.jsonl")
    lines = [
        ln for ln in open(manifest).read().splitlines()
        if json.loads(ln)["key"] in ("filter", "dedup")
    ]
    open(manifest, "w").write("\n".join(lines) + "\n")
    shutil.rmtree(os.path.join(out, "part=decontam"))
    shutil.rmtree(os.path.join(out, "part=pack"))

    early = sorted(
        glob.glob(os.path.join(out, "part=filter", "*", "*.parquet"))
    ) + sorted(glob.glob(os.path.join(out, "part=dedup", "*", "*.parquet")))
    mtimes = {f: os.stat(f).st_mtime_ns for f in early}
    res2 = run_text_clean(SF, out)
    rows = lambda st: {k: (v["rows_in"], v["rows_out"])
                       for k, v in st.items()}  # noqa: E731
    assert rows(res2["stages"]) == rows(res["stages"])
    assert {f: os.stat(f).st_mtime_ns for f in early} == mtimes
