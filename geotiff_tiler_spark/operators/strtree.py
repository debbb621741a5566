"""Numpy STRtree + WKB polygons + vectorized ray casting.

The reference relies on geopandas/shapely's STRtree for candidate
selection ("O(log n) candidate selection rather than iterating all
features per patch", reference vector.py:36-62) and shapely for the exact
intersects test. Neither library exists in this environment, so this
module implements the two public, textbook algorithms from scratch on
numpy:

- Sort-Tile-Recursive bulk-loaded R-tree (Leutenegger et al. 1997):
  leaves are packed by x-then-y tile order; internal levels are the
  packed bounding boxes of their children.
- Even-odd ray casting for point-in-polygon (with holes: a point is
  inside iff it crosses an odd number of edges across all rings).

Everything is float64 numpy; per-batch vectorized (points x edges), no
per-row Python in the hot loop. Used inside Arrow-batched pandas UDFs —
the "broadcast STRtree per cell" stage of the north star.

WKB support: little-endian Polygon (3) / MultiPolygon (6), the subset the
engine's synthetic label layers emit.
"""

from __future__ import annotations

import struct

import numpy as np

LEAF_CAPACITY = 16


class STRtree:
    """Packed R-tree over boxes (n, 4) [xmin, ymin, xmax, ymax]."""

    def __init__(self, boxes: np.ndarray, leaf_capacity: int = LEAF_CAPACITY):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        n = len(boxes)
        self.boxes = boxes
        if n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels: list[np.ndarray] = []
            self.cap = leaf_capacity
            return
        # STR packing: sort by center x, slice into sqrt(n/cap) vertical
        # strips, sort each strip by center y
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        n_leaves = -(-n // leaf_capacity)
        n_strips = max(1, int(np.ceil(np.sqrt(n_leaves))))
        per_strip = n_strips * leaf_capacity
        by_x = np.argsort(cx, kind="stable")
        order = np.empty(n, dtype=np.int64)
        for s in range(0, n, per_strip):
            strip = by_x[s : s + per_strip]
            order[s : s + len(strip)] = strip[np.argsort(cy[strip], kind="stable")]
        self.order = order
        self.cap = leaf_capacity
        # build levels bottom-up: level[0] = leaf bboxes, each next level
        # packs `cap` children
        self.levels = []
        cur = boxes[order]
        while len(cur) > 1:
            m = len(cur)
            groups = -(-m // leaf_capacity)
            lvl = np.empty((groups, 4), dtype=np.float64)
            for g in range(groups):
                chunk = cur[g * leaf_capacity : (g + 1) * leaf_capacity]
                lvl[g, 0] = chunk[:, 0].min()
                lvl[g, 1] = chunk[:, 1].min()
                lvl[g, 2] = chunk[:, 2].max()
                lvl[g, 3] = chunk[:, 3].max()
            self.levels.append(lvl)
            cur = lvl

    def query_point(self, x: float, y: float) -> np.ndarray:
        """Indices (into original boxes) whose box contains (x, y)."""
        return self.query_box(x, y, x, y)

    def query_box(self, xmin, ymin, xmax, ymax) -> np.ndarray:
        """Indices of boxes intersecting the query box."""
        n = len(self.boxes)
        if n == 0:
            return np.empty(0, dtype=np.int64)
        # descend from top level; node ranges are contiguous in `order`
        cand = np.array([0], dtype=np.int64)  # group ids at top level
        for depth in range(len(self.levels) - 1, -1, -1):
            lvl = self.levels[depth]
            # children of group g at this level: indices g*cap..(g+1)*cap-1
            child_ids = (cand[:, None] * self.cap + np.arange(self.cap)[None, :]).ravel()
            child_ids = child_ids[child_ids < len(lvl)]
            b = lvl[child_ids]
            hit = (
                (b[:, 0] <= xmax) & (b[:, 2] >= xmin) & (b[:, 1] <= ymax) & (b[:, 3] >= ymin)
            )
            cand = child_ids[hit]
            if len(cand) == 0:
                return np.empty(0, dtype=np.int64)
        # cand are leaf-group ids -> expand to item positions in `order`
        item_pos = (cand[:, None] * self.cap + np.arange(self.cap)[None, :]).ravel()
        item_pos = item_pos[item_pos < n]
        idx = self.order[item_pos]
        b = self.boxes[idx]
        hit = (b[:, 0] <= xmax) & (b[:, 2] >= xmin) & (b[:, 1] <= ymax) & (b[:, 3] >= ymin)
        return idx[hit]


# ---------------------------------------------------------------------------
# WKB (little-endian Polygon / MultiPolygon)
# ---------------------------------------------------------------------------


def wkb_polygon(rings: list[np.ndarray]) -> bytes:
    """Encode rings [(k,2) arrays, closed or open] as WKB Polygon."""
    out = [struct.pack("<BI", 1, 3), struct.pack("<I", len(rings))]
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        out.append(struct.pack("<I", len(r)))
        out.append(r.astype("<f8").tobytes())
    return b"".join(out)


def wkb_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = [struct.pack("<BI", 1, 6), struct.pack("<I", len(polys))]
    for rings in polys:
        out.append(wkb_polygon(rings))
    return b"".join(out)


def parse_wkb(buf: bytes) -> list[list[np.ndarray]]:
    """Decode WKB Polygon/MultiPolygon -> list of polygons (list of rings)."""

    def _read_polygon(mv: memoryview, off: int):
        (nrings,) = struct.unpack_from("<I", mv, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (npts,) = struct.unpack_from("<I", mv, off)
            off += 4
            arr = np.frombuffer(mv, dtype="<f8", count=npts * 2, offset=off).reshape(
                npts, 2
            )
            rings.append(arr.astype(np.float64))
            off += npts * 16
        return rings, off

    mv = memoryview(buf)
    byte_order, geom_type = struct.unpack_from("<BI", mv, 0)
    if byte_order != 1:
        raise ValueError("big-endian WKB not supported")
    if geom_type == 3:
        rings, _ = _read_polygon(mv, 5)
        return [rings]
    if geom_type == 6:
        (npolys,) = struct.unpack_from("<I", mv, 5)
        off = 9
        polys = []
        for _ in range(npolys):
            bo, gt = struct.unpack_from("<BI", mv, off)
            if gt != 3:
                raise ValueError(f"nested geom type {gt}")
            rings, off = _read_polygon(mv, off + 5)
            polys.append(rings)
        return polys
    raise ValueError(f"unsupported geom type {geom_type}")


def polygon_bbox(polys: list[list[np.ndarray]]) -> tuple[float, float, float, float]:
    pts = np.vstack([r for rings in polys for r in rings])
    return pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()


# ---------------------------------------------------------------------------
# Ray casting
# ---------------------------------------------------------------------------


def points_in_rings(xs: np.ndarray, ys: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd point-in-polygon for a batch of points, vectorized
    (points x edges). Holes: odd total crossings across all rings == inside.
    Boundary behavior follows the standard half-open crossing rule."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    inside = np.zeros(len(xs), dtype=bool)
    for r in rings:
        x1, y1 = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        # edge straddles the horizontal line through y (half-open)
        cond = (y1[None, :] <= ys[:, None]) != (y2[None, :] <= ys[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1[None, :] + (ys[:, None] - y1[None, :]) / (
                y2[None, :] - y1[None, :]
            ) * (x2[None, :] - x1[None, :])
        cross = cond & (xs[:, None] < xint)
        inside ^= (cross.sum(axis=1) % 2).astype(bool)
    return inside


def points_in_wkb(xs: np.ndarray, ys: np.ndarray, wkb: bytes) -> np.ndarray:
    """Point-in-(Multi)Polygon: inside any member polygon (even-odd holes)."""
    polys = parse_wkb(wkb)
    out = np.zeros(len(np.asarray(xs)), dtype=bool)
    for rings in polys:
        out |= points_in_rings(xs, ys, rings)
    return out


# ---------------------------------------------------------------------------
# Polygon clipping (Sutherland-Hodgman) + validity repair
# ---------------------------------------------------------------------------


def clip_ring_to_box(ring: np.ndarray, xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
    """Clip one ring to an axis-aligned box (Sutherland-Hodgman, the
    textbook algorithm). Returns the clipped ring ((k,2), possibly empty).
    Convex clip window => result is a single ring, matching the reference's
    geom.intersection(patch_box) for simple polygons (vector.py:65-149)."""
    pts = ring[:-1] if len(ring) > 1 and np.array_equal(ring[0], ring[-1]) else ring

    def clip_edge(poly, inside, intersect):
        out = []
        n = len(poly)
        for i in range(n):
            cur, prev = poly[i], poly[i - 1]
            cin, pin = inside(cur), inside(prev)
            if cin:
                if not pin:
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif pin:
                out.append(intersect(prev, cur))
        return out

    poly = [tuple(p) for p in pts]
    edges = [
        (lambda p: p[0] >= xmin, lambda a, b: _ix_vert(a, b, xmin)),
        (lambda p: p[0] <= xmax, lambda a, b: _ix_vert(a, b, xmax)),
        (lambda p: p[1] >= ymin, lambda a, b: _ix_horz(a, b, ymin)),
        (lambda p: p[1] <= ymax, lambda a, b: _ix_horz(a, b, ymax)),
    ]
    for inside, intersect in edges:
        poly = clip_edge(poly, inside, intersect)
        if not poly:
            return np.empty((0, 2))
    arr = np.array(poly)
    return np.vstack([arr, arr[:1]])


def _ix_vert(a, b, x):
    t = (x - a[0]) / (b[0] - a[0])
    return (x, a[1] + t * (b[1] - a[1]))


def _ix_horz(a, b, y):
    t = (y - a[1]) / (b[1] - a[1])
    return (a[0] + t * (b[0] - a[0]), y)


def ring_area(ring: np.ndarray) -> float:
    """Shoelace area (absolute)."""
    pts = ring if len(ring) > 1 and np.array_equal(ring[0], ring[-1]) else np.vstack([ring, ring[:1]])
    x, y = pts[:-1, 0], pts[:-1, 1]
    x2, y2 = pts[1:, 0], pts[1:, 1]
    return abs(float(np.sum(x * y2 - x2 * y)) / 2.0)


def snap_coords(ring: np.ndarray, grid: float = 0.01) -> np.ndarray:
    """Coordinate snapping to a precision grid (reference vector.py:119:
    shapely.set_precision with 0.01)."""
    return np.round(ring / grid) * grid


def repair_polygons(polys: list[list[np.ndarray]], min_area: float = 0.0) -> list[list[np.ndarray]]:
    """Degenerate-ring cleanup: drop rings with < 3 distinct points or zero
    area, and polygons whose outer ring vanished. Self-intersection repair
    is the separate `make_valid_polygons` (applied at vector-layer load,
    like the reference's make_valid(); the clip paths produce convex
    intersections and only need this cheap pass)."""
    out = []
    for rings in polys:
        kept = [
            r
            for r in rings
            if len(np.unique(r[:-1] if np.array_equal(r[0], r[-1]) else r, axis=0)) >= 3
            and ring_area(r) > min_area
        ]
        if kept:
            out.append(kept)
    return out


# ---------------------------------------------------------------------------
# make_valid: self-intersection repair (reference io.py:89-104)
# ---------------------------------------------------------------------------


def _proper_intersections(ring: np.ndarray) -> dict[int, list[tuple[float, np.ndarray]]]:
    """Pairwise proper crossings between non-adjacent edges of one ring.

    Returns {edge_index: [(t_along_edge, point), ...]}. O(E^2) — rings are
    label-feature sized and this runs inside an Arrow-batched UDF."""
    pts = ring[:-1] if len(ring) > 1 and np.array_equal(ring[0], ring[-1]) else ring
    n = len(pts)
    hits: dict[int, list[tuple[float, np.ndarray]]] = {}
    for i in range(n):
        a1, a2 = pts[i], pts[(i + 1) % n]
        d1 = a2 - a1
        for j in range(i + 1, n):
            # skip adjacent edges (they share an endpoint by construction)
            if j == i + 1 or (i == 0 and j == n - 1):
                continue
            b1, b2 = pts[j], pts[(j + 1) % n]
            d2 = b2 - b1
            denom = d1[0] * d2[1] - d1[1] * d2[0]
            if denom == 0.0:
                continue  # parallel/collinear: no single crossing point
            w = b1 - a1
            t = (w[0] * d2[1] - w[1] * d2[0]) / denom
            u = (w[0] * d1[1] - w[1] * d1[0]) / denom
            if 1e-12 < t < 1 - 1e-12 and 1e-12 < u < 1 - 1e-12:
                p = a1 + t * d1
                hits.setdefault(i, []).append((t, p.copy()))
                hits.setdefault(j, []).append((u, p.copy()))
    return hits


def ring_is_simple(ring: np.ndarray) -> bool:
    """True when the ring has no proper self-crossings and no repeated
    (pinch) vertices."""
    pts = ring[:-1] if len(ring) > 1 and np.array_equal(ring[0], ring[-1]) else ring
    if len(np.unique(np.round(pts, 12), axis=0)) != len(pts):
        return False
    return not _proper_intersections(ring)


def _split_at_pinches(pts: np.ndarray, tol: float = 1e-9) -> list[np.ndarray]:
    """Walk a vertex sequence (crossing points already inserted) and pop a
    sub-ring every time a coordinate repeats — the classic dissolve-pinch
    decomposition that turns a bowtie into its two lobes."""
    stack: list[np.ndarray] = []
    out: list[np.ndarray] = []
    for p in pts:
        match = None
        for idx in range(len(stack)):
            if abs(stack[idx][0] - p[0]) <= tol and abs(stack[idx][1] - p[1]) <= tol:
                match = idx
                break
        if match is None:
            stack.append(p)
            continue
        sub = np.array(stack[match:] + [stack[match]])
        if len(sub) >= 4 and ring_area(sub) > 0.0:
            out.append(sub)
        stack = stack[: match + 1]
    if len(stack) >= 3:
        closed = np.array(stack + [stack[0]])
        if ring_area(closed) > 0.0:
            out.append(closed)
    return out


def _simple_subrings(ring: np.ndarray, max_passes: int = 4) -> list[np.ndarray]:
    """Decompose one (possibly self-intersecting) ring into simple rings:
    insert proper crossing points, split at pinch vertices, recurse while
    progress is made; still-non-simple leftovers are DROPPED (the
    reference filters geometries that remain invalid after make_valid)."""
    work = [ring]
    for _ in range(max_passes):
        nxt: list[np.ndarray] = []
        progressed = False
        for r in work:
            if ring_is_simple(r):
                nxt.append(r)
                continue
            pts = r[:-1] if np.array_equal(r[0], r[-1]) else r
            hits = _proper_intersections(r)
            seq: list[np.ndarray] = []
            for i in range(len(pts)):
                seq.append(pts[i])
                for _, p in sorted(hits.get(i, []), key=lambda tp: tp[0]):
                    seq.append(p)
            pieces = _split_at_pinches(seq)
            progressed = progressed or len(pieces) > 1 or (
                len(pieces) == 1 and len(pieces[0]) != len(r)
            )
            nxt.extend(pieces)
        work = nxt
        if not progressed:
            break
    return [r for r in work if ring_is_simple(r)]


def make_valid_polygons(polys: list[list[np.ndarray]]) -> list[list[np.ndarray]]:
    """make_valid analog (reference io.py:89-104): each polygon's rings are
    decomposed into simple sub-rings; every simple outer sub-ring becomes
    its own polygon, holes are re-attached to the sub-ring that contains
    them; rings that cannot be made simple are dropped. A bowtie outer
    ring therefore yields the MultiPolygon of its lobes — shapely
    make_valid's 'structure' result."""
    out: list[list[np.ndarray]] = []
    for rings in polys:
        if not rings:
            continue
        outers = _simple_subrings(rings[0])
        holes = [h2 for h in rings[1:] for h2 in _simple_subrings(h)]
        for o in outers:
            mine = [
                h
                for h in holes
                if points_in_rings(np.array([h[0, 0]]), np.array([h[0, 1]]), [o])[0]
            ]
            out.append([o, *mine])
    return repair_polygons(out)


def make_valid_wkb(wkb: bytes) -> bytes | None:
    """WKB-level make_valid + drop-if-unrepairable; None when nothing
    valid remains (caller filters, mirroring the reference's row drop)."""
    repaired = make_valid_polygons(parse_wkb(wkb))
    if not repaired:
        return None
    if len(repaired) == 1:
        return wkb_polygon(repaired[0])
    return wkb_multipolygon(repaired)


def clip_wkb_to_box(
    wkb: bytes, xmin: float, ymin: float, xmax: float, ymax: float, snap: float | None = 0.01
) -> tuple[bytes | None, bool]:
    """J7 exact clip + truncation flag (reference vector.py:65-149):
    intersection with the box; is_truncated = clip changed the geometry;
    empty intersection -> (None, _); coordinates snapped to 0.01."""
    polys = parse_wkb(wkb)
    clipped: list[list[np.ndarray]] = []
    truncated = False
    for rings in polys:
        new_rings = []
        for r in rings:
            c = clip_ring_to_box(r, xmin, ymin, xmax, ymax)
            if len(c) == 0:
                truncated = True
                continue
            if len(c) != len(r) or not np.allclose(c, r):
                truncated = True
            if snap:
                c = snap_coords(c, snap)
            new_rings.append(c)
        if new_rings:
            clipped.append(new_rings)
    clipped = repair_polygons(clipped)
    if not clipped:
        return None, truncated
    if len(clipped) == 1:
        return wkb_polygon(clipped[0]), truncated
    return wkb_multipolygon(clipped), truncated


def explode_multipolygon(wkb: bytes) -> list[bytes]:
    """X7: MultiPolygon -> Polygon parts, empties dropped
    (reference build_targets.py:44-59)."""
    return [wkb_polygon(rings) for rings in repair_polygons(parse_wkb(wkb))]
