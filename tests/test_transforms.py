"""Transform-chain analogues: fixtures ported from transform/attrname.rs:140-178
plus behavior tests for jsonify / dot_flatten / geom_stats / lod filter /
flatten_tree / mergedown."""

import numpy as np
import pyarrow as pa
import pytest

from plateau_gis_converter_ray.stages.transforms import (
    FieldRenamer,
    dot_flatten,
    filter_highest_lod,
    flatten_tree,
    geom_stats,
    jsonify,
    mergedown,
)


def test_rename_fixture():
    # attrname.rs:144-164
    tr = FieldRenamer(
        rules={
            "*:class": "分類",
            "luse:class": "土地利用区分",
            "wo_namespace": "wo_namespace_new",
        }
    )
    assert tr.rename("namespace:foo") == "foo"
    assert tr.rename("bldg:class") == "分類"
    assert tr.rename("luse:class") == "土地利用区分"
    assert tr.rename("foo") == "foo"
    assert tr.rename("wo_namespace") == "wo_namespace_new"


def test_rename_invalid_wildcard():
    # attrname.rs:166-177: only "*:" prefixed keys are wildcards
    tr = FieldRenamer(rules={"*use:class": "土地利用区分"})
    assert tr.rename("luse:class") == "class"
    assert tr.rename("bldg:class") == "class"
    assert tr.rename("*use:class") == "土地利用区分"


def test_rename_preserves_id_namespace():
    tr = FieldRenamer()
    assert tr.rename("gml:id") == "gml:id"  # attrname.rs:108-113
    assert tr.rename("gml:name") == "name"


def test_rename_batch():
    tr = FieldRenamer(rules={"*:height": "H"})
    t = pa.table({"bldg:height": [1.0], "bldg:usage": ["x"], "plain": [2]})
    out = tr(t)
    assert out.column_names == ["H", "usage", "plain"]


def test_shorten_dict_limit():
    with pytest.raises(ValueError):
        FieldRenamer(shorten={"a": "longerthan10chars"})


def test_jsonify():
    t = pa.table(
        {
            "a": pa.array([{"x": 1, "y": "s"}, None]),
            "b": pa.array([[1, 2], [3]]),
            "c": pa.array([1, 2]),
        }
    )
    out = jsonify(t, objects_only=True)
    assert out.column("a").to_pylist() == ['{"x":1,"y":"s"}', None]
    assert out.column("b").type == t.column("b").type  # arrays untouched
    out2 = jsonify(t, objects_only=False)
    assert out2.column("b").to_pylist() == ["[1,2]", "[3]"]


def test_dot_flatten():
    t = pa.table(
        {
            "a": pa.array([{"x": 1, "y": {"z": 2}}]),
            "b": pa.array([3]),
        }
    )
    out = dot_flatten(t)
    assert set(out.column_names) == {"a.x", "a.y.z", "b"}
    assert out.column("a.y.z").to_pylist() == [2]


def test_geom_stats():
    t = pa.table({"id": [1, 2, 3], "heights": [[1.0, 5.0, 3.0], [], [7.0]]})
    out = geom_stats(t, "heights")
    lo = out.column("minHeight").to_pylist()
    hi = out.column("maxHeight").to_pylist()
    assert lo[0] == 1.0 and hi[0] == 5.0
    assert np.isnan(lo[1]) and np.isnan(hi[1])
    assert lo[2] == 7.0 and hi[2] == 7.0


def test_filter_highest_lod():
    t = pa.table({"id": [1, 2, 3], "lods": [[0, 1, 2], [], [1]]})
    out = filter_highest_lod(t)
    assert out.column("id").to_pylist() == [1, 3]
    assert out.column("lod_kept").to_pylist() == [2, 1]
    low = filter_highest_lod(t, lowest=True)
    assert low.column("lod_kept").to_pylist() == [0, 1]


def test_flatten_tree():
    t = pa.table(
        {
            "id": ["p1", "p2"],
            "typ": ["Building", "Road"],
            "children": pa.array(
                [
                    [{"cid": "c1", "v": 1}, {"cid": "c2", "v": 2}],
                    [{"cid": "c3", "v": 3}],
                ]
            ),
        }
    )
    parents, kids = flatten_tree(t, "children", "id", type_col="typ")
    assert parents.column_names == ["id", "typ"]
    assert kids.column("cid").to_pylist() == ["c1", "c2", "c3"]
    assert kids.column("parentId").to_pylist() == ["p1", "p1", "p2"]
    assert kids.column("parentType").to_pylist() == ["Building", "Building", "Road"]


def test_mergedown():
    t = pa.table(
        {
            "id": [1],
            "geoms": [[10, 11]],
            "child_geoms": [[[11, 12], [13]]],
        }
    )
    out = mergedown(t, "child_geoms", "geoms")
    assert out.column("geoms").to_pylist() == [[10, 11, 12, 13]]  # deduped, ordered


def test_flatten_tree_childless_batch_keeps_schema(ray_session):
    """Review r4: a batch in which NO row has children must still emit
    typed parentId/parentType (untyped pa.array of an empty object array
    infers null and breaks downstream concat)."""
    import pyarrow as pa

    from plateau_gis_converter_ray.stages.transforms import flatten_tree

    child_t = pa.list_(pa.struct([("gml_id", pa.string())]))
    batch = pa.table(
        {
            "gml_id": pa.array(["a", "b"], pa.string()),
            "ftype": pa.array(["T", "T"], pa.string()),
            "children": pa.array([[], []], child_t),
        }
    )
    parents, child_tbl = flatten_tree(
        batch, children_col="children", id_col="gml_id", type_col="ftype"
    )
    assert child_tbl.num_rows == 0
    assert child_tbl.schema.field("parentId").type == pa.string()
    assert child_tbl.schema.field("parentType").type == pa.string()
