"""Drop-in compatibility surface mirroring the reference package's
public API (``equi7grid.core``), so a reference user can switch without
rewriting call sites:

    from equi7grid_ray.compat import get_standard_equi7grid
    grid = get_standard_equi7grid(500)
    grid.EU.lonlat_to_xy(15.1, 45.3)
    [t.name for t in grid.get_tiles_in_geog_bbox((16, 48, 18, 50), "T6")]
    tile = grid.get_tile_from_name("EU500M_E048N012T6")
    tile.rc2xy(444, 333); tile.xy2rc(3166500, 5178000)

Name scheme parity: the reference's *full* tilenames carry the sampling
("EU500M_E048N012T6", core.py:134-151); the engine's internal names are
"EU_E048N012T6".  This layer translates both ways.

Thin wrappers only -- every computation delegates to the engine modules
(api/roi/grid/aeqd); nothing here re-implements math.  Reference
surface: core.py:39-651.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np

from equi7grid_ray import api, roi
from equi7grid_ray.grid import GridSpec, allowed_samplings  # noqa: F401 (re-export)

__all__ = [
    "Equi7Tile",
    "Equi7TilingSystem",
    "Equi7Grid",
    "get_standard_equi7grid",
    "get_user_equi7grid",
    "get_equi7grid_from_grid_def",
    "get_equi7grid_from_file",
    "allowed_samplings",
]


def _sampling_token(sampling: float) -> str:
    s = float(sampling)
    return f"{int(s)}M" if s == int(s) else f"{s}M"


@dataclass
class Equi7Tile:
    """Reference-tile facade over the engine's TileInfo."""

    _info: api.TileInfo

    @property
    def name(self) -> str:
        i = self._info
        part = i.name.split("_", 1)[1]
        return f"{i.continent}{_sampling_token(i.sampling)}_{part}"

    def __str__(self) -> str:
        return self.name

    # raster addressing ------------------------------------------------
    def rc2xy(self, r, c, px_origin: str | None = None):
        return self._info.rc2xy(r, c, px_origin)

    def xy2rc(self, x, y, px_origin: str | None = None):
        return self._info.xy2rc(x, y, px_origin)

    @property
    def n_rows(self) -> int:
        return self._info.shape[0]

    @property
    def n_cols(self) -> int:
        return self._info.shape[1]

    @property
    def x_pixel_size(self) -> float:
        return self._info.sampling

    @property
    def y_pixel_size(self) -> float:
        return self._info.sampling

    @property
    def outer_boundary_corners(self):
        return self._info.outer_boundary_corners

    @property
    def outer_boundary_extent(self):
        return self._info.outer_boundary_extent

    @property
    def covers_land(self) -> bool:
        return self._info.covers_land

    def __getattr__(self, item):  # anything else: the engine TileInfo
        # guard dunder/underscore probes (pickle/copy look for
        # __setstate__ etc. BEFORE _info exists -- unguarded delegation
        # recurses forever)
        if item.startswith("_"):
            raise AttributeError(item)
        return getattr(self._info, item)


def _strip_sampling(ftilename: str) -> str:
    """'EU500M_E048N012T6' -> 'EU_E048N012T6' (engine-internal)."""
    head, _, rest = ftilename.partition("_")
    if len(head) > 2:  # sampling token present
        head = head[:2]
    return f"{head}_{rest}" if rest else ftilename


class Equi7TilingSystem:
    """Per-continent system facade (reference core.py:55-357)."""

    def __init__(self, continent: str, spec: GridSpec):
        self.continent = continent
        self.spec = spec

    # coordinate transforms -------------------------------------------
    def lonlat_to_xy(self, lon, lat, *, check_zone: bool = True):
        return api.system_lonlat_to_xy(
            self.continent, lon, lat, check_zone=check_zone, spec=self.spec
        )

    def xy_to_lonlat(self, x, y):
        return api.system_xy_to_lonlat(self.continent, x, y)

    def calc_length_distortion(self, x, y):
        return api.calc_length_distortion(self.continent, x, y)

    # tile accessors ---------------------------------------------------
    def get_tile_from_lonlat(self, lon, lat, tiling_id=None) -> Equi7Tile:
        return Equi7Tile(api.get_tile_from_lonlat(
            lon, lat, tiling_id, continent=self.continent, spec=self.spec
        ))

    def get_tile_from_xy(self, x, y, tiling_id=None) -> Equi7Tile:
        return Equi7Tile(api.get_tile_from_xy(
            self.continent, x, y, tiling_id, spec=self.spec
        ))

    def get_tile_from_name(self, ftilename: str) -> Equi7Tile:
        return Equi7Tile(api.get_tile_from_name(
            _strip_sampling(ftilename), self.spec
        ))

    def get_children_from_name(self, ftilename: str) -> Iterator[Equi7Tile]:
        for t in api.get_children_from_name(_strip_sampling(ftilename), self.spec):
            yield Equi7Tile(t)

    def get_parent_from_name(self, ftilename: str) -> Equi7Tile:
        return Equi7Tile(api.get_parent_from_name(
            _strip_sampling(ftilename), self.spec
        ))

    # ROI search -------------------------------------------------------
    def get_tiles_in_bbox(self, bbox, tiling_id="T6", *,
                          cover_land: bool = False) -> Iterator[Equi7Tile]:
        for name in roi.tiles_in_proj_bbox(
            self.continent, bbox, tiling_id, cover_land=cover_land, spec=self.spec
        ):
            yield Equi7Tile(api.get_tile_from_name(name, self.spec))

    def get_tiles_in_geog_bbox(self, bbox, tiling_id="T6", *,
                               cover_land: bool = False) -> Iterator[Equi7Tile]:
        for name in roi.tiles_in_geog_bbox(
            bbox, tiling_id, cover_land=cover_land, spec=self.spec,
            continents=[self.continent],
        ):
            yield Equi7Tile(api.get_tile_from_name(name, self.spec))

    def get_tiles_in_geom(self, geom, tiling_id="T6", *,
                          cover_land: bool = False,
                          crs: str = "geog") -> Iterator[Equi7Tile]:
        for name in roi.tiles_in_geom(
            geom, tiling_id, cover_land=cover_land, spec=self.spec,
            continents=[self.continent], crs=crs,
        ):
            yield Equi7Tile(api.get_tile_from_name(name, self.spec))


class Equi7Grid:
    """Whole-grid facade (reference core.py:359-535): per-continent
    systems as attributes AF..SA plus grid-level queries."""

    def __init__(self, spec: GridSpec):
        self.spec = spec
        for cont in spec.continents():
            setattr(self, cont, Equi7TilingSystem(cont, spec))

    @property
    def system_order(self) -> list[str]:
        return list(self.spec.continents())

    def __getitem__(self, continent: str) -> Equi7TilingSystem:
        return getattr(self, continent)

    def __contains__(self, lonlat) -> bool:
        lon, lat = lonlat
        return bool(api.get_systems_from_lonlat(lon, lat, self.spec))

    def get_systems_from_lonlat(self, lon, lat) -> list[str]:
        return api.get_systems_from_lonlat(lon, lat, self.spec)

    def lonlat_to_xy(self, lon, lat) -> dict[str, tuple[float, float]]:
        return api.lonlat_to_xy(lon, lat, self.spec)

    def calc_length_distortion_on_ellipsoid(self, lon, lat):
        return api.calc_length_distortion_on_ellipsoid(lon, lat)

    def get_tile_from_name(self, ftilename: str) -> Equi7Tile:
        return Equi7Tile(api.get_tile_from_name(
            _strip_sampling(ftilename), self.spec
        ))

    def get_tiles_in_geog_bbox(self, bbox, tiling_id="T6", *,
                               cover_land: bool = False) -> Iterator[Equi7Tile]:
        for name in roi.tiles_in_geog_bbox(
            bbox, tiling_id, cover_land=cover_land, spec=self.spec
        ):
            yield Equi7Tile(api.get_tile_from_name(name, self.spec))

    def get_tiles_in_geom(self, geom, tiling_id="T6", *,
                          cover_land: bool = False,
                          crs: str = "geog") -> Iterator[Equi7Tile]:
        for name in roi.tiles_in_geom(
            geom, tiling_id, cover_land=cover_land, spec=self.spec, crs=crs
        ):
            yield Equi7Tile(api.get_tile_from_name(name, self.spec))


def get_standard_equi7grid(sampling, *, buffered: bool = False,
                           continent_order=None) -> Equi7Grid:
    """Reference core.py:572-602."""
    return Equi7Grid(GridSpec.standard(
        sampling=sampling, buffered=buffered,
        continent_order=list(continent_order) if continent_order else None,
    ))


def get_user_equi7grid(sampling, tiling_defs, *, buffered: bool = False,
                       continent_order=None) -> Equi7Grid:
    """Reference core.py:538-569."""
    return Equi7Grid(GridSpec(
        sampling=sampling, tilings=tiling_defs, buffered=buffered,
        continent_order=list(continent_order) if continent_order else None,
    ))


def get_equi7grid_from_grid_def(grid_def: dict) -> Equi7Grid:
    """Reference core.py:605-629."""
    return Equi7Grid(GridSpec.from_grid_def(grid_def))


def get_equi7grid_from_file(path) -> Equi7Grid:
    """Reference core.py:632-648."""
    return Equi7Grid(GridSpec.from_file(path))
