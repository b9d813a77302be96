"""CityGML-shaped XML source: real per-file parse + codelist resolution
(source/citygml.rs:60-141 role), values pinned against the generator
arithmetic."""

import numpy as np

from plateau_gis_converter_ray.sources.citygml_xml import (
    USAGE_CODES,
    ensure_citygml_corpus,
    read_citygml,
)


def test_citygml_parse_matches_generator(ray_session):
    d = ensure_citygml_corpus(0.001)  # 5 files x 64 buildings
    pdf = read_citygml(d).to_pandas().sort_values("gml_id").reset_index(drop=True)
    n = len(pdf)
    assert n == 320
    idx = np.arange(n)
    # ids, heights, usage resolution, district generic attribute
    assert pdf["gml_id"].tolist() == [f"bldg_{i:08d}" for i in idx]
    assert (pdf["height"].to_numpy() == (idx * 7) % 200 + 3).all()
    names = np.array(list(USAGE_CODES.values()), dtype=object)
    assert (pdf["usage"].to_numpy() == names[idx % len(names)]).all()
    assert (pdf["district"].to_numpy() == np.array(
        [f"d{i % 16}" for i in idx], dtype=object)).all()
    # posList axis swap: lng column carries the SECOND posList coordinate
    from plateau_gis_converter_ray.stages.geocode import geocode_arith

    lng, lat = geocode_arith(idx)
    assert np.allclose(pdf["lng"].to_numpy(), np.round(lng, 7))
    assert np.allclose(pdf["lat"].to_numpy(), np.round(lat, 7))
    assert (pdf["n_ring_pts"] == 5).all()
    # per-file parallel read: every file contributed rows
    assert pdf["file"].nunique() == 5


def test_citygml_parse_query(ray_session):
    import __ray_entry__ as em

    agg = (
        em.queries()["citygml_parse"]("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("usage")
    )
    assert len(agg) == 8 and agg["n_buildings"].sum() == 320
    # pin one group against the arithmetic: usage u0 -> 'residential' are
    # indices 0, 8, 16, ...
    idx = np.arange(0, 320, 8)
    want = int(((idx * 7) % 200 + 3).sum() * 100)
    assert int(agg.loc["residential", "sum_height_c"]) == want
