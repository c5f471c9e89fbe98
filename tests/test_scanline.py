"""Scanline/Bresenham kernel parity tests.

Oracles are literal Python ports of the reference loops
(`alg/llrasterize.cpp` GDALdllImageFilledPolygon :60-225 and
GDALdllImageLine :246-390) — slow, set-based, used only here.
"""

import numpy as np
import pytest

from lib_gdal_ray.geom import scanline


# ---------------------------------------------------------------------------
# literal-port oracles
# ---------------------------------------------------------------------------

def ref_filled_polygon(parts, width, height):
    xs = np.concatenate([np.asarray(p)[:, 0] for p in parts])
    ys = np.concatenate([np.asarray(p)[:, 1] for p in parts])
    sizes = [len(p) for p in parts]
    n = len(xs)
    dminy, dmaxy = ys.min(), ys.max()
    miny = int(max(0.0, dminy))
    maxy = int(min(dmaxy, height - 1))
    maxx = width - 1
    out = set()
    for y in range(miny, maxy + 1):
        dy = y + 0.5
        ints = []
        partoffset = 0
        part = 0
        for i in range(n):
            if i == partoffset + sizes[part]:
                partoffset += sizes[part]
                part += 1
            if i == partoffset:
                ind1 = partoffset + sizes[part] - 1
                ind2 = partoffset
            else:
                ind1, ind2 = i - 1, i
            dy1, dy2 = ys[ind1], ys[ind2]
            if (dy1 < dy and dy2 < dy) or (dy1 > dy and dy2 > dy):
                continue
            if dy1 < dy2:
                dx1, dx2 = xs[ind1], xs[ind2]
            elif dy1 > dy2:
                dy1, dy2 = dy2, dy1
                dx2, dx1 = xs[ind1], xs[ind2]
            else:
                if xs[ind1] > xs[ind2]:
                    hx1 = np.floor(xs[ind2] + 0.5)
                    hx2 = np.floor(xs[ind1] + 0.5)
                    if hx1 > maxx or hx2 <= 0:
                        continue
                    a = int(max(hx1, 0.0))
                    b = int(min(hx2, width))
                    for x in range(a, b):
                        out.add((x, y))
                continue
            if dy < dy2 and dy >= dy1:
                intersect = (dy - dy1) * (dx2 - dx1) / (dy2 - dy1) + dx1
                ints.append(int(np.floor(intersect + 0.5)))
        ints.sort()
        for i in range(0, len(ints) - 1, 2):
            if ints[i] <= maxx and ints[i + 1] > 0:
                for x in range(max(ints[i], 0), min(ints[i + 1], width)):
                    out.add((x, y))
    return out


def ref_line(parts, width, height):
    out = set()
    for p in parts:
        p = np.asarray(p, dtype=np.float64)
        for j in range(1, len(p)):
            iX = int(np.floor(p[j - 1, 0]))
            iY = int(np.floor(p[j - 1, 1]))
            iX1 = int(np.floor(p[j, 0]))
            iY1 = int(np.floor(p[j, 1]))
            dX = abs(iX1 - iX)
            dY = abs(iY1 - iY)
            sX = -1 if iX > iX1 else 1
            sY = -1 if iY > iY1 else 1
            last = j == len(p) - 1
            if dX >= dY:
                xerr = dY << 1
                yerr = xerr - (dX << 1)
                err = xerr - dX
                if not last:
                    dX -= 1
                while dX >= 0:
                    if 0 <= iX < width and 0 <= iY < height:
                        out.add((iX, iY))
                    iX += sX
                    if err > 0:
                        iY += sY
                        err += yerr
                    else:
                        err += xerr
                    dX -= 1
            else:
                xerr = dX << 1
                yerr = xerr - (dY << 1)
                err = xerr - dY
                if not last:
                    dY -= 1
                while dY >= 0:
                    if 0 <= iX < width and 0 <= iY < height:
                        out.add((iX, iY))
                    iY += sY
                    if err > 0:
                        iX += sX
                        err += yerr
                    else:
                        err += xerr
                    dY -= 1
    return out


def as_set(ix, iy):
    return set(zip(ix.tolist(), iy.tolist()))


# ---------------------------------------------------------------------------
# fill
# ---------------------------------------------------------------------------

def test_fill_box_exact():
    # box [2,5]x[2,5]: scanlines with y+0.5 in [2,5) => y=2,3,4;
    # crossings floor(2+.5)=2, floor(5+.5)=5 => span [2,4]
    ring = np.array([[2.0, 2.0], [5.0, 2.0], [5.0, 5.0], [2.0, 5.0]])
    ix, iy = scanline.fill_polygon([ring], 16, 16)
    assert as_set(ix, iy) == {(x, y) for x in (2, 3, 4) for y in (2, 3, 4)}


def test_fill_triangle_vs_ref():
    tri = np.array([[1.2, 1.1], [10.7, 2.3], [4.6, 9.9]])
    ix, iy = scanline.fill_polygon([tri], 16, 16)
    assert as_set(ix, iy) == ref_filled_polygon([tri], 16, 16)


def test_fill_donut_hole():
    outer = np.array([[1.0, 1.0], [11.0, 1.0], [11.0, 11.0], [1.0, 11.0]])
    hole = np.array([[4.0, 4.0], [8.0, 4.0], [8.0, 8.0], [4.0, 8.0]])
    got = as_set(*scanline.fill_polygon([outer, hole], 16, 16))
    ref = ref_filled_polygon([outer, hole], 16, 16)
    assert got == ref
    assert (5, 5) not in got and (2, 2) in got


@pytest.mark.parametrize("seed", range(8))
def test_fill_random_polygons_vs_ref(seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(3, 9))
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    r = rng.uniform(2, 14, k)
    cx, cy = rng.uniform(8, 24, 2)
    ring = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
    got = as_set(*scanline.fill_polygon([ring], 32, 32))
    assert got == ref_filled_polygon([ring], 32, 32)


def test_fill_chunked_equals_whole():
    rng = np.random.default_rng(7)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 7))
    ring = np.stack([16 + 12 * np.cos(ang), 16 + 12 * np.sin(ang)], axis=1)
    whole = as_set(*scanline.fill_polygon([ring], 32, 32))
    parts = set()
    for y0 in range(0, 32, 5):
        parts |= as_set(*scanline.fill_polygon([ring], 32, 32,
                                               y_lo=y0, y_hi=y0 + 4))
    assert parts == whole


def test_fill_clip_to_raster():
    ring = np.array([[-5.0, -5.0], [10.0, -5.0], [10.0, 4.0], [-5.0, 4.0]])
    ix, iy = scanline.fill_polygon([ring], 8, 8)
    assert ix.min() >= 0 and iy.min() >= 0
    assert ix.max() <= 7
    # rows 0..3 fully covered for x in [0,7]
    assert as_set(ix, iy) == {(x, y) for x in range(8) for y in range(4)}


# ---------------------------------------------------------------------------
# lines
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(12))
def test_bresenham_vs_ref(seed):
    rng = np.random.default_rng(100 + seed)
    pts = rng.uniform(0, 30, (int(rng.integers(2, 6)), 2))
    got = as_set(*scanline.burn_lines([pts], 32, 32))
    assert got == ref_line([pts], 32, 32)


def test_bresenham_single_pixel():
    p = np.array([[3.2, 4.7], [3.9, 4.1]])
    assert as_set(*scanline.burn_lines([p], 8, 8)) == {(3, 4)}


def test_all_touched_vertical_horizontal():
    v = np.array([[3.5, 1.2], [3.5, 6.8]])
    ix, iy = scanline.burn_lines_all_touched([v], 16, 16)
    assert as_set(ix, iy) == {(3, y) for y in range(1, 7)}
    h = np.array([[1.2, 3.5], [6.8, 3.5]])
    ix, iy = scanline.burn_lines_all_touched([h], 16, 16)
    assert as_set(ix, iy) == {(x, 3) for x in range(1, 7)}


def test_all_touched_supercover_diagonal():
    d = np.array([[0.5, 0.5], [3.5, 2.5]])
    got = as_set(*scanline.burn_lines_all_touched([d], 8, 8))
    # slope 2/3 from (0.5,0.5): passes pixels (0,0),(1,0),(1,1),(2,1),(3,1)? compute:
    # crossings x=1,2,3; y=1,2 -> midpoints give the supercover
    assert (0, 0) in got and (3, 2) in got
    # contiguity: every consecutive pair differs by one step
    assert len(got) >= 5


def test_all_touched_intersect_only_skips_boundary_aligned():
    # vertical line exactly on pixel boundary x=4.0 with intersect_only
    v = np.array([[4.0, 1.0], [4.0, 6.0]])
    ix, iy = scanline.burn_lines_all_touched([v], 16, 16, intersect_only=True)
    assert len(ix) == 0


# ---------------------------------------------------------------------------
# shape dispatch
# ---------------------------------------------------------------------------

def test_rasterize_shape_polygon_all_touched_superset():
    tri = np.array([[1.2, 1.1], [10.7, 2.3], [4.6, 9.9]])
    plain = as_set(*scanline.rasterize_shape("polygon", [tri], 16, 16))
    at = as_set(*scanline.rasterize_shape("polygon", [tri], 16, 16,
                                          all_touched=True))
    assert plain <= at
    assert len(at) > len(plain)


def test_rasterize_shape_unique():
    tri = np.array([[1.2, 1.1], [10.7, 2.3], [4.6, 9.9]])
    ix, iy = scanline.rasterize_shape("polygon", [tri], 16, 16,
                                      all_touched=True)
    assert len(np.unique(iy * 16 + ix)) == len(ix)
