"""Projection stage — the ProjectionTransform analogue (SURVEY §2.2 row 1).

Actor-pool ``map_batches`` class: the geoid grid (and the per-zone ETMerc
series constants) are built ONCE per actor in ``__init__`` — the same
shared-state shape as the reference's ``Arc<Jgd2011ToWgs84>`` handed to every
transform worker (transformer/builder.rs:103,112-115). The transform chain
mirrors transform/projection.rs:19-185:

  axis swap (input is lat,lng order) ->
  JGD2011 -> WGS84 geoid height shift ->
  one output CRS: lnglat | webmercator meters | ECEF (geocentric) |
  a Japan Plane Rectangular zone (ETMerc)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.projection import (
    GeoidGrid,
    geodetic_to_geocentric,
    jpr_zone_projection,
    wgs84,
)
from ..kernels.webmercator import lnglat_to_web_mercator_meters

OUTPUT_CRS = ("lnglat", "webmercator", "ecef", "jpr")


class ProjectionStage:
    def __init__(self, output: str = "lnglat", jpr_zone: int = 9,
                 apply_geoid: bool = True, swap_axes: bool = False):
        if output not in OUTPUT_CRS:
            raise ValueError(f"output must be one of {OUTPUT_CRS}")
        self.output = output
        self.swap_axes = swap_axes
        self.geoid = GeoidGrid() if apply_geoid else None
        self.proj = jpr_zone_projection(jpr_zone) if output == "jpr" else None
        self.ellips = wgs84()

    def __call__(self, batch: pa.Table) -> pa.Table:
        lng = batch.column("lng").to_numpy()
        lat = batch.column("lat").to_numpy()
        if self.swap_axes:
            lng, lat = lat, lng
        h = (
            batch.column("height").to_numpy()
            if "height" in batch.column_names
            else np.zeros(len(lng))
        )
        if self.geoid is not None:
            lng, lat, h = self.geoid.jgd2011_to_wgs84(lng, lat, h)

        if self.output == "lnglat":
            out = {"lng": lng, "lat": lat, "height": h}
        elif self.output == "webmercator":
            mx, my = lnglat_to_web_mercator_meters(lng, lat)
            out = {"mx": mx, "my": my, "height": h}
        elif self.output == "ecef":
            x, y, z = geodetic_to_geocentric(self.ellips, lng, lat, h)
            out = {"ecef_x": x, "ecef_y": y, "ecef_z": z}
        else:  # jpr
            x, y, z = self.proj.forward(lng, lat, h)
            out = {"jpr_x": x, "jpr_y": y, "height": z}

        drop = [c for c in ("lng", "lat", "height") if c in batch.column_names]
        t = batch.drop_columns(drop)
        for k, v in out.items():
            t = t.append_column(k, pa.array(v))
        return t
