"""Equi7Grid constants: the seven continental projection systems and the
standard tiling hierarchy.

Projection parameters are the published PROJ4 definitions of EPSG
27701-27707 (/root/reference/README.md:48-54); tiling origins and the
T6/T3/T1 hierarchy mirror /root/reference/src/equi7grid/_create_grids.py
(min_xy at :44-81, tilings at :94-100) and _const.py:7 (MAX_SAMPLING).
"""

from __future__ import annotations

from dataclasses import dataclass

MAX_SAMPLING = 10_000.0

#: dict-build order of the reference's system definitions
#: (/root/reference/src/equi7grid/_create_grids.py:83-91) -- this is the
#: default ``system_order`` used when iterating continents.
DEFAULT_CONTINENT_ORDER = ["AF", "AN", "AS", "EU", "OC", "NA", "SA"]


@dataclass(frozen=True)
class ContinentDef:
    """One continental AEQD projection system."""

    name: str
    epsg: int
    lat_0: float
    lon_0: float
    x_0: float
    y_0: float
    min_x: float
    min_y: float

    @property
    def polar(self) -> bool:
        return abs(self.lat_0) == 90.0


CONTINENTS: dict[str, ContinentDef] = {
    "AF": ContinentDef("AF", 27701, 8.5, 21.5, 5621452.01998, 5990638.42298, 0.0, 0.0),
    "AN": ContinentDef("AN", 27702, -90.0, 0.0, 3714266.97719, 3402016.50625, 0.0, 0.0),
    "AS": ContinentDef("AS", 27703, 47.0, 94.0, 4340913.84808, 4812712.92347, 0.0, -1_800_000.0),
    "EU": ContinentDef("EU", 27704, 53.0, 24.0, 5837287.81977, 2121415.69617, 0.0, -600_000.0),
    "NA": ContinentDef("NA", 27705, 52.0, -97.5, 8264722.17686, 4867518.35323, 0.0, 0.0),
    "OC": ContinentDef("OC", 27706, -19.5, 131.5, 6988408.5356, 7654884.53733, 0.0, 0.0),
    "SA": ContinentDef("SA", 27707, -14.0, -60.5, 7257179.23559, 5592024.44605, 0.0, 0.0),
}

#: standard tiling hierarchy: level -> (name, tile size in metres)
STANDARD_TILINGS: dict[int, tuple[str, float]] = {
    1: ("T6", 600_000.0),
    2: ("T3", 300_000.0),
    3: ("T1", 100_000.0),
}

#: max segment length (deg) used when densifying geometries before
#: projecting them (matches pytileproj's DEF_SEG_LEN_DEG usage at
#: /root/reference/src/equi7grid/core.py:25,409).
DEF_SEG_LEN_DEG = 0.1
