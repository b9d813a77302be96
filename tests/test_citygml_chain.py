"""Transform chain + appearance resolve driven end-to-end by REAL parsed
CityGML XML (v2 corpus) — golden counts pinned against the generator
arithmetic, the load_examples.rs:107-135 pattern."""

import numpy as np
import pandas as pd
import pytest

SF = 0.001  # 5 files x 64 features


@pytest.fixture(scope="module")
def corpus_dir():
    from plateau_gis_converter_ray.sources.citygml_xml import (
        ensure_citygml_corpus_v2,
    )

    return ensure_citygml_corpus_v2(SF)


def _expected_counts(n: int, n_files: int) -> pd.DataFrame:
    idx = np.arange(n)
    rows = []
    # buildings keep lod1 (lods [0,1] -> highest), 2 rings x 5 pts
    b = idx[idx % 6 == 0]
    rows.append(("bldg:Building", 1, len(b), 10 * len(b), len(b)))
    p = idx[(idx % 6 == 0) & (idx % 4 == 0)]
    rows.append(("bldg:BuildingPart", 1, len(p), 5 * len(p), 0))
    # bridge: lod2 solid, exterior 5 + interior 4 + second surface 5
    br = idx[idx % 6 == 4]
    rows.append(("brid:Bridge", 2, len(br), 14 * len(br), len(br)))
    fr = idx[idx % 6 == 3]
    rows.append(("frn:CityFurniture", 1, len(fr), 5 * len(fr), len(fr)))
    lu = idx[idx % 6 == 2]
    rows.append(("luse:LandUse", 0, len(lu), 5 * len(lu), len(lu)))
    rd = idx[idx % 6 == 1]
    rows.append(("tran:Road", 1, len(rd), 5 * len(rd), len(rd)))
    vg = idx[idx % 6 == 5]
    rows.append(
        ("veg:SolitaryVegetationObject", 1, len(vg), 5 * len(vg), len(vg))
    )
    # one unknown-type (generic-fallback) wtr:WaterBody per file
    rows.append(("wtr:WaterBody", 1, n_files, 5 * n_files, n_files))
    return pd.DataFrame(
        rows, columns=["ftype", "lod_kept", "n_features", "sum_pts", "n_grade"]
    )


def test_chain_golden_counts(ray_session, corpus_dir):
    from plateau_gis_converter_ray.pipelines.citygml_chain import (
        citygml_chain_counts,
    )

    got = (
        citygml_chain_counts(corpus_dir)
        .to_pandas()
        .sort_values(["ftype", "lod_kept"])
        .reset_index(drop=True)
    )
    n = 5 * 64
    exp = _expected_counts(n, 5).sort_values(
        ["ftype", "lod_kept"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[exp.columns].astype({"lod_kept": np.int64}), exp,
        check_dtype=False,
    )


def test_chain_rows_attribute_tree_depth(ray_session, corpus_dir):
    """The depth-3 generic-attribute tree survives parse -> dot_flatten:
    leaves land as flat columns with the generator's values (including
    the third-level prov.src leaf on every typed feature)."""
    from plateau_gis_converter_ray.pipelines.citygml_chain import (
        citygml_chain_ds,
    )

    df = citygml_chain_ds(corpus_dir).to_pandas()
    b = df[df["ftype"] == "bldg:Building"].copy()
    idx = b["gml_id"].str.replace("bldg_", "").astype(int)
    assert (b["usage"].to_numpy() == [f"u{i % 8}" for i in idx]).all()
    assert (b["district"].to_numpy() == [f"d{i % 16}" for i in idx]).all()
    assert (b["grade"].to_numpy() == [f"g{i % 5}" for i in idx]).all()
    assert (b["prov_src"].to_numpy() == [f"s{i % 3}" for i in idx]).all()
    # the depth-3 leaf also lands on every NON-building typed feature
    others = df[~df["ftype"].isin(["bldg:Building", "bldg:BuildingPart"])]
    oidx = others["gml_id"].str.split("_").str[-1].astype(int)
    assert (others["prov_src"].to_numpy()
            == [f"s{i % 3}" for i in oidx]).all()
    # flattened parts carry parent attribution (flatten.rs role)
    parts = df[df["ftype"] == "bldg:BuildingPart"]
    pidx = parts["gml_id"].str.replace("part_", "").astype(int)
    assert (parts["parentId"].to_numpy()
            == [f"bldg_{i:08d}" for i in pidx]).all()
    assert (parts["parentType"] == "bldg:Building").all()


def test_jsonify_from_parsed_xml(ray_session, corpus_dir):
    """JsonifyTransform over the REAL nested attrs struct: the JSON string
    round-trips to the parsed tree."""
    import json

    from plateau_gis_converter_ray.sources.citygml_xml import read_citygml_v2
    from plateau_gis_converter_ray.stages.transforms import jsonify

    ds = read_citygml_v2(corpus_dir).map_batches(
        lambda b: jsonify(b.select(["gml_id", "attrs"])),
        batch_format="pyarrow",
    )
    df = ds.to_pandas()
    row = df[df["gml_id"] == "bldg_00000006"].iloc[0]
    tree = json.loads(row["attrs"])
    assert tree["usage"] == "u6"
    assert tree["extra"]["district"] == "d6"
    assert tree["extra"]["meta"]["grade"] == "g1"
    assert tree["extra"]["meta"]["prov"]["src"] == "s0"
    assert tree["extra"]["score"] == 3.0
    # the new types round-trip their own attrs through jsonify too
    veg = json.loads(df[df["gml_id"] == "veg_00000005"].iloc[0]["attrs"])
    assert veg["height_m"] == 6.5 and veg["extra"]["meta"]["prov"]["src"] == "s2"
    brid = json.loads(df[df["gml_id"] == "brid_00000004"].iloc[0]["attrs"])
    assert brid["function"] == "f4"


def test_mergedown_from_parsed_xml(ray_session, corpus_dir):
    """GeometricMergedownTransform off parsed XML: part rings merge into
    the root; features without parts keep their own ring count."""
    from plateau_gis_converter_ray.pipelines.citygml_chain import (
        citygml_mergedown_ds,
    )

    df = citygml_mergedown_ds(corpus_dir).to_pandas()
    b = df[df["ftype"] == "bldg:Building"].copy()
    idx = b["gml_id"].str.replace("bldg_", "").astype(int)
    # building own rings = 2 (lod0 + lod1); +1 part ring when idx%4==0
    exp = np.where(idx % 4 == 0, 3, 2)
    assert (b["n_rings_merged"].to_numpy() == exp).all()
    assert (df[df["ftype"] == "tran:Road"]["n_rings_merged"] == 1).all()
    # bridge: exterior + interior + second surface, no children
    assert (df[df["ftype"] == "brid:Bridge"]["n_rings_merged"] == 3).all()


def test_appearance_xml_two_phase(ray_session, corpus_dir):
    """Phase-1 XML theme stores + phase-2 resolve == generator arithmetic:
    theme selection per file, texture by ring target (+3 uri offset under
    the FME fallback), material by surface target, dummy/no-material
    demotion."""
    from plateau_gis_converter_ray.pipelines.citygml_chain import (
        appearance_resolve_xml_ds,
    )
    from plateau_gis_converter_ray.stages.appearance import (
        DUMMY_TEXTURE,
        NO_MATERIAL,
    )

    df = appearance_resolve_xml_ds(corpus_dir).to_pandas()
    assert len(df) == 5 * 65  # 64 typed members + 1 generic WaterBody/file
    # the generic-fallback features' targets are NOT in any theme store:
    # they must demote to the dummy texture / no-material sentinels
    wtr = df[df["gml_id"].str.startswith("wtr_")]
    assert len(wtr) == 5
    assert (wtr["texture"] == DUMMY_TEXTURE).all()
    assert (wtr["material"] == NO_MATERIAL).all()
    df = df[~df["gml_id"].str.startswith("wtr_")].copy()
    f = df["file"].str.replace(".gml", "", regex=False).astype(int)
    idx = df["gml_id"].str.split("_").str[-1].astype(int)
    rgb = (f % 4 != 0).to_numpy()
    assert (df["theme"].to_numpy() == np.where(rgb, "rgbTexture", "FMETheme")).all()
    off = np.where(rgb, 0, 3)
    exp_tex = np.where(
        (idx % 5 != 0).to_numpy(),
        [f"tex_{(i * 7 + o) % 100}.jpg" for i, o in zip(idx, off)],
        DUMMY_TEXTURE,
    )
    assert (df["texture"].to_numpy() == exp_tex).all()
    c = ((idx + off) % 9) / 8
    exp_mat = np.where(
        (idx % 7 != 0).to_numpy(),
        [f"{v:.3f} {v:.3f} {v:.3f}" for v in c],
        NO_MATERIAL,
    )
    assert (df["material"].to_numpy() == exp_mat).all()
