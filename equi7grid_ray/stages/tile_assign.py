"""The flagship hot path: image rows -> Equi7 tile assignments, as a
stateful ``map_batches`` callable over zero-copy Arrow batches.

Pipeline per batch (all vectorized):

  decode (optional)  ->  zone classify (raster PIP)  ->  per-continent
  AEQD forward  ->  tile floor + name codec  ->  covers_land lookup

One row is emitted per (image x containing zone) -- the reference's
``Grid.lonlat_to_xy`` multi-zone semantics (core.py + pytileproj,
tests/test_equi7grid.py:405-439) as a vectorized explode.  The heavy
spatial state (zone raster, tile tables) is built/loaded once per actor
in ``__init__`` (actor-pool stage), never per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from equi7grid_ray import aeqd
from equi7grid_ray.cells import cell_id
from equi7grid_ray.codec import decode_image, png_stream_stats
from equi7grid_ray.grid import GridSpec, full_names, tile_ll_from_xy
from equi7grid_ray.sources.images import centers_for_index
from equi7grid_ray.tiling_state import get_grid_state

__all__ = ["TileAssigner", "derive_lonlat", "CELL_LEVEL"]

#: default coarse-cell level for the shuffle key (~0.7 deg cells)
CELL_LEVEL = 9


def derive_lonlat(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Center lon/lat for a batch: use explicit columns when present,
    else integer-microdegree columns, else the deterministic image_id
    sweep (sources/images.py)."""
    names = batch.column_names
    if "lon" in names and "lat" in names:
        return (
            batch.column("lon").to_numpy(zero_copy_only=False),
            batch.column("lat").to_numpy(zero_copy_only=False),
        )
    if "lon_udeg" in names:
        return (
            batch.column("lon_udeg").to_numpy(zero_copy_only=False) / 1e6,
            batch.column("lat_udeg").to_numpy(zero_copy_only=False) / 1e6,
        )
    # image_id is "img%012d": strip the prefix and cast in Arrow (no
    # Python-level loop over 100k+ strings)
    import pyarrow.compute as pc

    idx = pc.cast(
        pc.utf8_slice_codeunits(batch.column("image_id"), 3, 32), pa.int64()
    ).to_numpy(zero_copy_only=False)
    return centers_for_index(idx)


class TileAssigner:
    """Actor-pool stage: ``ds.map_batches(TileAssigner, fn_constructor_kwargs=...,
    batch_format='pyarrow', concurrency=N)``."""

    def __init__(
        self,
        tiling_id: str = "T6",
        *,
        spec: GridSpec | None = None,
        decode: bool = False,
        emit_cell: bool = True,
        emit_xy: bool = True,
        emit_id: bool = True,
        passthrough: tuple[str, ...] = (),
        exact_projection: bool = False,
    ):
        self.spec = spec or GridSpec.standard()
        self.state = get_grid_state(self.spec)
        self.tiling = self.spec.tiling_name(tiling_id)
        self.tile_size = self.spec.tile_size(tiling_id)
        self.decode = decode
        self.emit_cell = emit_cell
        self.emit_xy = emit_xy
        # emit_id=False is the projection-pushdown path for terminal
        # aggregates (tile histogram) that never read the id column:
        # skips an 8B read + 16B gather + 8B emit per row -- measurable
        # against a shared memory bus at full-machine concurrency.
        self.emit_id = emit_id
        self.passthrough = passthrough
        self.continents = self.spec.continents()
        self.zone_cols = [self.state.zc.order.index(c) for c in self.continents]
        self._tilings = {c: self.state.tiles(c, self.tiling) for c in self.continents}
        # precomputed full-name table per continent: the per-row "codec"
        # becomes an indexed gather instead of string formatting
        self._names = {
            c: full_names(c, ct.ll_x, ct.ll_y, self.tiling)
            for c, ct in self._tilings.items()
        }
        # global dictionary for dictionary-encoded output (index gather
        # replaces any per-row string work)
        self._dict_offsets = {}
        off = 0
        parts = []
        for c in self.continents:
            self._dict_offsets[c] = off
            parts.append(self._names[c])
            off += len(self._names[c])
        self._dict_values = pa.array(
            np.concatenate(parts) if parts else np.empty(0, dtype="U16")
        )
        self._cont_values = pa.array(np.asarray(self.continents, dtype="U2"))
        # forward projectors: gridded bicubic interpolation of the exact
        # AEQD forward per non-polar zone (max error < 1e-3 m, two-plus
        # orders inside the reference accuracy contract of rtol 1e-7 --
        # see equi7grid_ray/interp.py).  Pass exact_projection=True to
        # force the Karney solver everywhere.
        self._proj = {}
        if not exact_projection:
            from equi7grid_ray.interp import build_zone_projectors

            self._proj = build_zone_projectors(
                self.state.zc.polys, self.continents
            )

    #: top-level cache block: the assign pipeline materializes ~20
    #: batch-length arrays (projection, floor, lookup, take); slicing the
    #: batch keeps that working set near L2 instead of streaming every
    #: intermediate through DRAM -- the difference between ~1.7 and ~4
    #: us/row/core at 32-way concurrency on a shared memory bus.
    CHUNK_ROWS = 65_536

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows > 2 * self.CHUNK_ROWS and not self.decode:
            parts = [
                self._assign(batch.slice(st, self.CHUNK_ROWS))
                for st in range(0, batch.num_rows, self.CHUNK_ROWS)
            ]
            return pa.concat_tables(parts)
        return self._assign(batch)

    def _assign(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        lon, lat = derive_lonlat(batch)

        px_mean = None
        if self.decode:
            # zero-copy payload access: slice the binary column's value
            # buffer with its offsets instead of to_pylist() (which would
            # copy every payload into a Python bytes object)
            col = batch.column("bytes")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            bufs = col.buffers()
            width = 8 if pa.types.is_large_binary(col.type) else 4
            odt = np.int64 if width == 8 else np.int32
            offs = np.frombuffer(bufs[1], dtype=odt)[col.offset : col.offset + n + 1]
            data = memoryview(bufs[2])
            fmt_col = batch.column("fmt")
            known = pc.is_in(fmt_col, value_set=pa.array(["png", "raw"]))
            if not pc.all(known).as_py():
                bad = pc.unique(pc.drop_null(
                    pc.if_else(known, pa.scalar(None, pa.string()), fmt_col)
                )).to_pylist()
                raise NotImplementedError(
                    f"image format(s) {bad}: real codecs unavailable in sandbox"
                )
            is_png = pc.equal(fmt_col, "png").to_numpy(zero_copy_only=False)
            ws = batch.column("w").to_numpy()
            hs = batch.column("h").to_numpy()
            px_mean = np.empty(n, dtype=np.float64)
            # raw rows decode to exactly their payload bytes: mean them all
            # in ONE vectorized reduceat pass over the Arrow value buffer
            # (no per-row Python, no copies)
            raw_rows = np.flatnonzero(~is_png)
            if len(raw_rows):
                lens = (offs[raw_rows + 1] - offs[raw_rows]).astype(np.int64)
                expect = ws[raw_rows].astype(np.int64) * hs[raw_rows].astype(np.int64)
                if (lens != expect).any():
                    j = raw_rows[int(np.flatnonzero(lens != expect)[0])]
                    raise ValueError(
                        f"raw payload length mismatch at row {j}: "
                        f"{int(offs[j+1]-offs[j])} bytes for w*h="
                        f"{int(ws[j])*int(hs[j])}"
                    )
                values = np.frombuffer(data, dtype=np.uint8)
                bounds = np.empty(2 * len(raw_rows), dtype=np.int64)
                bounds[0::2] = offs[raw_rows]
                bounds[1::2] = offs[raw_rows + 1]
                # reduceat sums [bounds[i], bounds[i+1]); it cannot take an
                # index == len, so a final payload touching the buffer end
                # is summed separately (never clamp+re-add: a 1-byte final
                # payload would be double-counted)
                tail_sum = 0
                n_pairs = len(raw_rows)
                if bounds[-1] >= len(values):
                    s_last, e_last = int(bounds[-2]), int(bounds[-1])
                    tail_sum = int(values[s_last:e_last].sum(dtype=np.int64))
                    bounds = bounds[:-2]
                    n_pairs -= 1
                if n_pairs:
                    sums = np.add.reduceat(values, bounds, dtype=np.int64)[0::2]
                    # an empty segment makes reduceat return values[idx]
                    sums[bounds[0::2] == bounds[1::2]] = 0
                else:
                    sums = np.empty(0, np.int64)
                if n_pairs < len(raw_rows):
                    sums = np.append(sums, tail_sum)
                px_mean[raw_rows] = sums / np.maximum(
                    ws[raw_rows].astype(np.float64) * hs[raw_rows], 1.0
                )
            for j in np.flatnonzero(is_png):
                # streaming inflate: exact integer pixel sum through a
                # bounded window, no decoded-frame materialization
                st = png_stream_stats(data[offs[j] : offs[j + 1]])
                if st is None:  # filtered PNG: needs full reconstruction
                    img = decode_image(
                        data[offs[j] : offs[j + 1]], "png",
                        int(ws[j]), int(hs[j]), copy=False,
                    )
                    px_mean[j] = img.mean()
                else:
                    psum, _sq, hh, ww, ch, _ = st
                    px_mean[j] = psum / (hh * ww * ch)

        # packed uint8 zone bitmask: 1 byte/row instead of a (n, 7) bool
        # matrix (DRAM pressure at high concurrency)
        bits = self.state.zc.classify_bits(lon, lat)

        emit_xy = self.emit_xy
        out_idx: list[np.ndarray] = []
        out_rank: list[np.ndarray] = []
        out_x: list[np.ndarray] = []
        out_y: list[np.ndarray] = []
        out_llx: list[np.ndarray] = []
        out_lly: list[np.ndarray] = []
        out_land: list[np.ndarray] = []
        out_tidx: list[np.ndarray] = []
        any_miss = False
        miss_names: list[tuple[int, np.ndarray, np.ndarray, str]] = []
        for rank, (cont, zc_col) in enumerate(zip(self.continents, self.zone_cols)):
            rows = np.flatnonzero(bits & np.uint8(1 << zc_col))
            if len(rows) == 0:
                continue
            proj = self._proj.get(cont)
            if proj is not None:
                x, y = proj(lon[rows], lat[rows])
            else:
                x, y = aeqd.forward(cont, lon[rows], lat[rows])
            llx, lly = tile_ll_from_xy(x, y, self.tile_size)
            ct = self._tilings[cont]
            pos = ct.lookup(llx, lly)
            safe = np.maximum(pos, 0)
            land = np.where(pos >= 0, ct.covers_land[safe], False)
            tidx = safe.astype(np.int32) + np.int32(self._dict_offsets[cont])
            miss = pos < 0
            if miss.any():  # zone-edge float cases: format those few names
                any_miss = True
                miss_names.append(
                    (sum(len(a) for a in out_idx), miss,
                     _partial_full(cont, llx[miss], lly[miss], self.tiling), cont)
                )
            out_idx.append(rows)
            out_rank.append(np.full(len(rows), rank, dtype=np.int8))
            out_land.append(land)
            out_tidx.append(tidx)
            if emit_xy:  # projected coords only concatenated when emitted
                out_x.append(x)
                out_y.append(y)
                out_llx.append(llx)
                out_lly.append(lly)

        if not out_idx:
            idx = np.empty(0, dtype=np.int64)
            rank = np.empty(0, dtype=np.int8)
            x = y = llx = lly = np.empty(0)
            land = np.empty(0, dtype=bool)
            tidx = np.empty(0, dtype=np.int32)
        else:
            idx = np.concatenate(out_idx)
            rank = np.concatenate(out_rank)
            land = np.concatenate(out_land)
            tidx = np.concatenate(out_tidx)
            if emit_xy:
                x = np.concatenate(out_x)
                y = np.concatenate(out_y)
                llx = np.concatenate(out_llx)
                lly = np.concatenate(out_lly)

        dict_values = self._dict_values
        if any_miss:
            # rare zone-edge float cases: append the few out-of-table names
            # to the dictionary and rewrite just those indices -- the hot
            # rows keep their zero-copy dictionary encoding
            mpos: list[np.ndarray] = []
            mname: list[np.ndarray] = []
            for off, miss, mn, _c in miss_names:
                mpos.append(off + np.flatnonzero(miss))
                mname.append(mn)
            mpos_all = np.concatenate(mpos)
            uniq, inv = np.unique(np.concatenate(mname), return_inverse=True)
            tidx = tidx.copy()
            tidx[mpos_all] = np.int32(len(dict_values)) + inv.astype(np.int32)
            dict_values = pa.concat_arrays(
                [dict_values, pa.array(uniq.tolist(), pa.string())]
            )
        tile_col = pa.DictionaryArray.from_arrays(pa.array(tidx), dict_values)
        cont_col = pa.DictionaryArray.from_arrays(
            pa.array(rank.astype(np.int32)), self._cont_values
        )

        cols: dict[str, pa.Array] = {}
        if self.emit_id:
            cols["image_id"] = batch.column("image_id").take(pa.array(idx))
        cols["continent"] = cont_col
        cols["tile"] = tile_col
        cols["covers_land"] = pa.array(land, pa.bool_())
        if self.emit_xy:  # skip for minimal tile-assignment output
            cols["continent_rank"] = pa.array(rank, pa.int8())
            cols["x"] = pa.array(x, pa.float64())
            cols["y"] = pa.array(y, pa.float64())
            cols["ll_x"] = pa.array(llx, pa.float64())
            cols["ll_y"] = pa.array(lly, pa.float64())
        if self.emit_cell:
            cols["cell"] = pa.array(cell_id(lon[idx], lat[idx], CELL_LEVEL), pa.int64())
        if px_mean is not None:
            cols["px_mean"] = pa.array(px_mean[idx], pa.float64())
        for name in self.passthrough:
            if name in batch.column_names:
                cols[name] = batch.column(name).take(pa.array(idx))
        return pa.table(cols)


def _partial_full(cont: str, llx: np.ndarray, lly: np.ndarray, tiling: str) -> np.ndarray:
    from equi7grid_ray.grid import full_names

    return full_names(cont, llx, lly, tiling)


_PROC_CACHE: dict[str, TileAssigner] = {}


def make_assign_fn(broadcast: bool = True, **kwargs):
    """Task-based variant of the stage with broadcast state.

    When Ray is up, the TileAssigner (zone raster + tile tables + name
    dictionaries, ~tens of MB of numpy) is built ONCE on the driver and
    ``ray.put`` into the object store; each worker process deserializes
    it zero-copy on first use and caches it (`small-side lookup broadcast
    once, read in every task` -- never rebuilt per worker, never
    re-shipped per batch).  Falls back to per-process construction when
    Ray isn't initialised (plain local use)."""
    key = repr(sorted(kwargs.items(), key=lambda kv: kv[0]))
    ref = None
    if broadcast:
        try:
            import ray

            if ray.is_initialized():
                ref = ray.put(TileAssigner(**kwargs))
                key = key + str(ref)
        except Exception:
            ref = None

    def assign(batch: pa.Table) -> pa.Table:
        ta = _PROC_CACHE.get(key)
        if ta is None:
            if ref is not None:
                import ray

                ta = ray.get(ref)
            else:
                ta = TileAssigner(**kwargs)
            # bounded cache: every make_assign_fn call carries a fresh
            # ObjectRef in its key, so long-lived workers would otherwise
            # accumulate one ~50 MB assigner per pipeline construction
            while len(_PROC_CACHE) >= 4:
                _PROC_CACHE.pop(next(iter(_PROC_CACHE)))
            _PROC_CACHE[key] = ta
        return ta(batch)

    return assign
