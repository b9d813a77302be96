"""ESRI-WKT CRS repository for the shapefile sink — all 75 EPSG codes the
reference ships (``nusamai/src/sink/shapefile/crs.rs:10-359``).

The reference hard-codes 75 WKT1_ESRI strings; the same catalogue is
generated here from its parameter structure (these are public standard
definitions — EPSG/ESRI data, not code):

- 4326 / 4979 (WGS84 2D/3D), 3857 (Web Mercator)
- 6668 / 6697 (JGD2011 geographic, 2D / +vertical)
- 6669..6687   JGD2011 / Japan Plane Rectangular zones 1..19
- 10162..10174 JGD2011 zones 1..13 + JGD2011 vertical height (3D)
- 2443..2461   JGD2000 zones 1..19
- 30161..30179 Tokyo datum (Bessel 1841) zones 1..19

Zone origins are the public Japan Plane Rectangular CS table
(kernels/projection.py JPR_ZONES, pinned against PROJ fixtures).
"""

from __future__ import annotations

from ..kernels.projection import JPR_ZONES

_DEG_UNIT = 'UNIT["Degree",0.0174532925199433]'
_VERTCS = (
    'VERTCS["JGD2011_vertical_height",'
    'VDATUM["Japanese_Geodetic_Datum_2011_vertical"],'
    'PARAMETER["Vertical_Shift",0.0],PARAMETER["Direction",1.0],'
    'UNIT["Meter",1.0]]'
)

_GEOGCS = {
    "wgs84": (
        'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",'
        f'6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],{_DEG_UNIT}]'
    ),
    "jgd2011": (
        'GEOGCS["GCS_JGD_2011",DATUM["D_JGD_2011",SPHEROID["GRS_1980",'
        f'6378137.0,298.257222101]],PRIMEM["Greenwich",0.0],{_DEG_UNIT}]'
    ),
    "jgd2000": (
        'GEOGCS["GCS_JGD_2000",DATUM["D_JGD_2000",SPHEROID["GRS_1980",'
        f'6378137.0,298.257222101]],PRIMEM["Greenwich",0.0],{_DEG_UNIT}]'
    ),
    "tokyo": (
        'GEOGCS["GCS_Tokyo",DATUM["D_Tokyo",SPHEROID["Bessel_1841",'
        f'6377397.155,299.1528128]],PRIMEM["Greenwich",0.0],{_DEG_UNIT}]'
    ),
}


def _num(x: float) -> str:
    """Reference-style number rendering: integral -> '33.0', else 12
    decimal places with trailing zeros trimmed ('132.166666666667')."""
    return f"{x:.1f}" if float(x) == int(x) else f"{x:.12f}".rstrip("0")


def _zone_projcs(name: str, geogcs: str, zone: int,
                 vertcs: bool = False) -> str:
    lng0, lat0 = JPR_ZONES[zone]
    body = (
        f'PROJCS["{name}",{geogcs},'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],'
        f'PARAMETER["Central_Meridian",{_num(lng0)}],'
        'PARAMETER["Scale_Factor",0.9999],'
        f'PARAMETER["Latitude_Of_Origin",{_num(lat0)}],UNIT["Meter",1.0]]'
    )
    return body + ("," + _VERTCS if vertcs else "")


def _build() -> dict[int, str]:
    out: dict[int, str] = {
        4326: _GEOGCS["wgs84"],
        4979: (
            'GEOGCS["WGS_1984_3D",DATUM["D_WGS_1984",SPHEROID["WGS_1984",'
            '6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],'
            f'{_DEG_UNIT},LINUNIT["Meter",1.0]]'
        ),
        3857: (
            'PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",'
            f'{_GEOGCS["wgs84"]},'
            'PROJECTION["Mercator_Auxiliary_Sphere"],'
            'PARAMETER["False_Easting",0.0],'
            'PARAMETER["False_Northing",0.0],'
            'PARAMETER["Central_Meridian",0.0],'
            'PARAMETER["Standard_Parallel_1",0.0],'
            'PARAMETER["Auxiliary_Sphere_Type",0.0],UNIT["Meter",1.0]]'
        ),
        6668: _GEOGCS["jgd2011"],
        6697: _GEOGCS["jgd2011"] + "," + _VERTCS,
    }
    for z in range(1, 20):
        out[6669 + z - 1] = _zone_projcs(
            f"JGD_2011_Japan_Zone_{z}", _GEOGCS["jgd2011"], z
        )
        out[2443 + z - 1] = _zone_projcs(
            f"JGD_2000_Japan_Zone_{z}", _GEOGCS["jgd2000"], z
        )
        out[30161 + z - 1] = _zone_projcs(
            f"Japan_Zone_{z}", _GEOGCS["tokyo"], z
        )
    for z in range(1, 14):
        out[10162 + z - 1] = _zone_projcs(
            f"JGD_2011_Japan_Zone_{z}", _GEOGCS["jgd2011"], z, vertcs=True
        )
    return out


WKT_EPSG: dict[int, str] = _build()


def wkt_for_epsg(code: int) -> str | None:
    """The .prj WKT for an EPSG code, None when unsupported (the
    reference's ProjectionRepository.get role)."""
    return WKT_EPSG.get(int(code))
