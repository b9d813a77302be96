"""Wave 45 pins: FastSS edit-distance join vs brute-force Levenshtein
(including an indel-coverage corpus with mixed-length names), and the
token-first-seen / vocabulary-growth fold vs a sequential scan."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_SMALL


def _lev1(a: str, b: str) -> int | None:
    """Levenshtein if <= 1 else None (scalar reference)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == lb:
        return 1 if sum(x != y for x, y in zip(a, b)) == 1 else None
    if abs(la - lb) != 1:
        return None
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1 :] else None


class TestEditDistancePairs:
    def test_matches_brute(self, ray_session):
        from plateau_gis_converter_ray.pipelines.queries import (
            q_edit_distance_pairs,
        )

        out = q_edit_distance_pairs(SF_SMALL).to_pandas()
        t = pq.read_table(
            f"{SF_SMALL}/customer.parquet", columns=["c_custkey", "c_name"]
        ).to_pandas()
        keys = t["c_custkey"].to_numpy()
        names = t["c_name"].to_numpy()
        want = set()
        for i in range(len(t)):
            for j in range(i + 1, len(t)):
                d = _lev1(names[i], names[j])
                if d is not None:
                    a, b = sorted((int(keys[i]), int(keys[j])))
                    want.add((a, b, d))
        got = set(
            zip(
                out["key_a"].astype(int),
                out["key_b"].astype(int),
                out["dist"].astype(int),
            )
        )
        assert got == want

    def test_indel_path(self, ray_session, tmp_path):
        # mixed-length corpus exercises the insertion/deletion branch the
        # uniform TPC-H names never hit
        from plateau_gis_converter_ray.pipelines.queries import (
            q_edit_distance_pairs,
        )

        names = [
            "alpha", "alpah", "alph", "alphax", "beta", "betaa", "bet",
            "gamma", "gamm", "gamma", "delta",
        ]
        tbl = pa.table(
            {
                "c_custkey": pa.array(range(len(names)), pa.int64()),
                "c_name": pa.array(names),
            }
        )
        os.makedirs(tmp_path / "d", exist_ok=True)
        pq.write_table(tbl, tmp_path / "d" / "customer.parquet")
        out = q_edit_distance_pairs(str(tmp_path / "d")).to_pandas()
        want = set()
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                d = _lev1(names[i], names[j])
                if d is not None:
                    want.add((i, j, d))
        got = set(
            zip(
                out["key_a"].astype(int),
                out["key_b"].astype(int),
                out["dist"].astype(int),
            )
        )
        assert got == want
        # the duplicate "gamma" pair must surface with dist 0
        assert (7, 9, 0) in got


class TestVocabGrowth:
    def test_matches_sequential_scan(self, ray_session):
        from plateau_gis_converter_ray.pipelines.queries import q_vocab_growth

        out = q_vocab_growth(SF_SMALL).to_pandas()
        t = pq.read_table(
            f"{SF_SMALL}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        t = t.sort_values("doc_id")
        dmin = int(t["doc_id"].min())
        first: dict[str, int] = {}
        for did, txt in zip(t["doc_id"], t["text"]):
            for w in str(txt).split(" "):
                if w and w not in first:
                    first[w] = int(did)
        buckets: dict[int, int] = {}
        for fd in first.values():
            b = (fd - dmin + 1).bit_length() - 1
            buckets[b] = buckets.get(b, 0) + 1
        want = pd.DataFrame(
            sorted(buckets.items()), columns=["bucket", "new_terms"]
        )
        want["cum_vocab"] = want["new_terms"].cumsum()
        got = out.sort_values("bucket").reset_index(drop=True)
        assert got["bucket"].tolist() == want["bucket"].tolist()
        assert got["new_terms"].tolist() == want["new_terms"].tolist()
        assert got["cum_vocab"].tolist() == want["cum_vocab"].tolist()
        assert int(got["cum_vocab"].iloc[-1]) == len(first)
