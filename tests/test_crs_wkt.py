"""Shapefile CRS catalogue: all 75 EPSG codes of the reference's
ProjectionRepository (shapefile/crs.rs:10-359), generated from the public
zone-parameter table and byte-compared against the reference when its
source tree is present."""

import os
import re

import pytest

from plateau_gis_converter_ray.kernels.projection import JPR_ZONES
from plateau_gis_converter_ray.sinks.crs_wkt import WKT_EPSG, wkt_for_epsg
from plateau_gis_converter_ray.sinks.shapefile import resolve_prj

ALL_CODES = (
    [4326, 4979, 3857, 6668, 6697]
    + list(range(6669, 6688))      # JGD2011 zones 1..19
    + list(range(10162, 10175))    # JGD2011 zones 1..13 + vertical
    + list(range(2443, 2462))      # JGD2000 zones 1..19
    + list(range(30161, 30180))    # Tokyo datum zones 1..19
)

# the reference's own hand-typed anomaly: entry 10174 reads
# "JGD_>2011_Japan_Zone_13" (crs.rs:92); the engine emits the evident
# intended name and the parity test below excludes that one byte
REF_TYPO_CODE = 10174

CRS_RS = "/root/reference/nusamai/src/sink/shapefile/crs.rs"


def test_all_75_codes_present():
    assert len(ALL_CODES) == 75
    assert len(WKT_EPSG) == 75
    for code in ALL_CODES:
        wkt = wkt_for_epsg(code)
        assert wkt, code
        assert wkt.startswith(("GEOGCS[", "PROJCS[")), code


def test_zone_parameters_match_jpr_table():
    for z in range(1, 20):
        lng0, lat0 = JPR_ZONES[z]
        for base in (6669, 2443, 30161):
            wkt = WKT_EPSG[base + z - 1]
            cm = float(
                re.search(r'"Central_Meridian",([\d.]+)', wkt).group(1)
            )
            lo = float(
                re.search(r'"Latitude_Of_Origin",([\d.]+)', wkt).group(1)
            )
            assert abs(cm - lng0) < 1e-9 and lo == lat0, (base, z)


def test_datum_per_family():
    assert "D_JGD_2011" in WKT_EPSG[6669]
    assert "D_JGD_2000" in WKT_EPSG[2443]
    assert "Bessel_1841" in WKT_EPSG[30161]
    assert "VERTCS" in WKT_EPSG[10162] and "VERTCS" in WKT_EPSG[6697]
    assert "Mercator_Auxiliary_Sphere" in WKT_EPSG[3857]


def test_resolve_prj_accepts_epsg_and_aliases():
    assert resolve_prj(6669) == WKT_EPSG[6669]
    assert resolve_prj("6697") == WKT_EPSG[6697]
    assert resolve_prj("wgs84").startswith('GEOGCS["GCS_WGS_1984"')
    assert resolve_prj("jpr9").startswith('PROJCS["JGD_2011_Japan_Zone_9"')
    with pytest.raises(KeyError):
        resolve_prj(9999)


@pytest.mark.skipif(not os.path.exists(CRS_RS), reason="reference absent")
def test_byte_parity_with_reference():
    src = re.sub(r"//.*", "", open(CRS_RS).read())
    pairs = re.findall(r'\(\s*(\d+),\s*r#"(.*?)"#,\s*\)', src, re.S)
    assert len(pairs) == 75
    for code_s, want in pairs:
        code = int(code_s)
        got = WKT_EPSG[code]
        if code == REF_TYPO_CODE:
            want = want.replace("JGD_>2011", "JGD_2011")
        assert got == want, code
