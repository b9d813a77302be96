"""Wave 42 pins: Kendall tau-b and Spearman rho vs naive scalar
recomputes on the same daily table (both also oracle-gated at three
scales; these pins prove the blocked pair count and the 2x-scaled
average-rank algebra against the textbook definitions)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from tests.conftest import SF_SMALL


def _daily():
    t = pq.read_table(
        f"{SF_SMALL}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    ).to_pandas()
    t["day"] = t["o_orderdate"].astype("datetime64[us]").astype(np.int64) // 86_400_000_000
    t["rev"] = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
    g = t.groupby("day").agg(cnt=("rev", "size"), rev=("rev", "sum"))
    return g.reset_index().sort_values("day").reset_index(drop=True)


class TestKendallTau:
    def test_matches_scalar_pairs(self, ray_session):
        from plateau_gis_converter_ray.pipelines.queries import (
            q_kendall_tau_daily,
        )

        out = q_kendall_tau_daily(SF_SMALL)
        d = _daily()
        x = d["cnt"].to_numpy()
        y = d["rev"].to_numpy()
        n = len(d)
        conc = disc = 0
        for i in range(n):
            for j in range(i + 1, n):
                s = np.sign(x[j] - x[i]) * np.sign(y[j] - y[i])
                conc += s == 1
                disc += s == -1
        assert int(out["concordant"][0]) == conc
        assert int(out["discordant"][0]) == disc
        n0 = n * (n - 1) // 2
        tx = int(out["ties_x"][0])
        ty = int(out["ties_y"][0])
        want = float(conc - disc) / math.sqrt(float(n0 - tx) * float(n0 - ty))
        assert float(out["tau_b"][0]) == want


class TestSpearman:
    def test_matches_pandas_rank_pearson(self, ray_session):
        from plateau_gis_converter_ray.pipelines.queries import q_spearman_daily

        out = q_spearman_daily(SF_SMALL)
        d = _daily()
        rx = d["cnt"].rank(method="average")
        ry = d["rev"].rank(method="average")
        want = np.corrcoef(rx, ry)[0, 1]
        assert abs(float(out["spearman_rho"][0]) - want) < 1e-12

    def test_bounds(self, ray_session):
        from plateau_gis_converter_ray.pipelines.queries import (
            q_kendall_tau_daily,
            q_spearman_daily,
        )

        rho = float(q_spearman_daily(SF_SMALL)["spearman_rho"][0])
        tau = float(q_kendall_tau_daily(SF_SMALL)["tau_b"][0])
        assert -1.0 <= rho <= 1.0 and -1.0 <= tau <= 1.0
