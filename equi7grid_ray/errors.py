"""Error types mirroring the reference API surface
(pytileproj's GeomOutOfZoneError / TileOutOfZoneError, raised at
/root/reference/src/equi7grid/core.py:204-205 and used in
/root/reference/tests/test_equi7grid.py:220-232, 421-428)."""

from __future__ import annotations


class GeomOutOfZoneError(ValueError):
    """A coordinate / geometry lies outside every requested projection zone."""


class TileOutOfZoneError(ValueError):
    """A (syntactically valid) tile lies outside its continent's zone."""
