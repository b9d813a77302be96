"""Wave 43 pins: t-closeness EMD algebra, Yule's K and hapax ratio vs
naive single-process recomputes (all three also oracle-gated at three
scales by tools/check_queries.py)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from tests.conftest import SF_SMALL


class TestTCloseness:
    def test_matches_fraction_emd(self, ray_session):
        from fractions import Fraction

        from plateau_gis_converter_ray.pipelines.queries import q_t_closeness

        out = q_t_closeness(SF_SMALL).to_pandas().set_index("o_orderpriority")
        t = pq.read_table(
            f"{SF_SMALL}/orders.parquet",
            columns=["o_orderpriority", "o_totalprice"],
        ).to_pandas()
        t["b"] = (
            np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
            // 500_000
        )
        buckets = np.sort(t["b"].unique())
        k = len(buckets)
        n_total = len(t)
        glob = t.groupby("b").size()
        for qid, g in t.groupby("o_orderpriority"):
            ng = len(g)
            gc = g.groupby("b").size()
            # Fraction-exact ordered EMD: sum of |cumulative prob diffs|
            # normalised by (k-1)
            cum = Fraction(0)
            emd = Fraction(0)
            for b in buckets:
                cum += Fraction(int(gc.get(b, 0)), ng) - Fraction(
                    int(glob[b]), n_total
                )
                emd += abs(cum)
            emd /= k - 1
            got = out.loc[qid]
            assert int(got["n_g"]) == ng
            assert int(got["k_buckets"]) == k
            # integer numerator == Fraction numerator under the common
            # denominator ng * n_total * (k-1)
            assert Fraction(int(got["t_num"]), ng * n_total * (k - 1)) == emd
            assert abs(float(got["t_close"]) - float(emd)) < 1e-12
            assert 0.0 <= float(got["t_close"]) <= 1.0


def _term_counts(key: str):
    t = pq.read_table(
        f"{SF_SMALL}/documents.parquet", columns=[key, "text"]
    ).to_pandas()
    per = {}
    for k, txt in zip(t[key], t["text"]):
        c = per.setdefault(k, Counter())
        c.update(w for w in str(txt).split(" ") if w)
    return per


class TestLexical:
    def test_yule_k(self, ray_session):
        from plateau_gis_converter_ray.pipelines.queries import q_yule_k

        out = q_yule_k(SF_SMALL).to_pandas().set_index("lang")
        for lang, c in _term_counts("lang").items():
            n = sum(c.values())
            c2 = sum(v * v for v in c.values())
            got = out.loc[lang]
            assert int(got["n_tok"]) == n
            assert int(got["sum_c2"]) == c2
            assert abs(float(got["yule_k"]) - 1e4 * (c2 - n) / n**2) < 1e-9

    def test_hapax_ratio(self, ray_session):
        from plateau_gis_converter_ray.pipelines.queries import q_hapax_ratio

        out = q_hapax_ratio(SF_SMALL).to_pandas().set_index("source")
        per = _term_counts("source")
        assert set(out.index) == set(per)
        for src, c in per.items():
            hapax = sum(1 for v in c.values() if v == 1)
            got = out.loc[src]
            assert int(got["vocab"]) == len(c)
            assert int(got["hapax"]) == hapax
            assert int(got["n_tok"]) == sum(c.values())
