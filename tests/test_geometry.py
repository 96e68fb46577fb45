"""Grid IO + batched metric terms vs closed forms (reference element.py:52-113)."""

import os

import numpy as np
import pytest

from dgtpu.geometry import (Geometry, element_coords, generate_annulus_grid,
                            generate_rectangle_grid, geometry_terms,
                            neighbor_map, read_plot3d, write_plot3d)
from dgtpu.level import GridLevel
from tests.conftest import INPUT_DIR

REF_INPUT = "/root/reference/input"


def test_plot3d_roundtrip(tmp_path):
    x, y = generate_rectangle_grid(3, 2, 2)
    p = os.path.join(tmp_path, "g.xyz")
    write_plot3d(p, x, y)
    x2, y2 = read_plot3d(p)
    assert np.array_equal(x, x2) and np.array_equal(y, y2)


@pytest.mark.skipif(not os.path.isdir(REF_INPUT), reason="reference grids unavailable")
@pytest.mark.parametrize("n,p", [(4, 1), (8, 5), (2, 2)])
def test_rectangle_generator_matches_shipped_grids(n, p):
    x, y = generate_rectangle_grid(n, n, p)
    xr, yr = read_plot3d(os.path.join(REF_INPUT, f"Rectangle_{n}X{n}_nPoly{p}.xyz"))
    assert np.abs(x - xr).max() == 0.0
    assert np.abs(y - yr).max() == 0.0


def _rect_level(base_settings, n=4, p_grid=1, p_sol=2):
    base_settings.update_setting("grid.polynomial_degree", p_grid)
    geom = Geometry(os.path.join(INPUT_DIR, f"Rectangle_{n}X{n}_nPoly{p_grid}.xyz"),
                    base_settings)
    return GridLevel(geom, base_settings, ["u"], {"u": p_sol})


def test_metric_terms_affine_rectangle(base_settings):
    """On the uniform rectangle, J = (hx/2)(hy/2), rx = 2/hx, sy = 2/hy."""
    lvl = _rect_level(base_settings, n=4, p_grid=1, p_sol=3)
    gt = lvl.gt
    h = 0.5  # 4 elements over [-1, 1]
    g = gt["u"]["e"]
    assert np.allclose(np.asarray(g["J"]), (h / 2) ** 2, atol=1e-14)
    assert np.allclose(np.asarray(g["rx"]), 2 / h, atol=1e-13)
    assert np.allclose(np.asarray(g["sy"]), 2 / h, atol=1e-13)
    assert np.allclose(np.asarray(g["ry"]), 0, atol=1e-13)
    assert np.allclose(np.asarray(g["sx"]), 0, atol=1e-13)
    assert np.allclose(np.asarray(gt["A"]), h * h, atol=1e-14)
    # face normals: i-faces point +x, j-faces +y; face Jacobian = h/2
    for side in ("imin", "imax"):
        assert np.allclose(np.asarray(gt["u"][side]["nx"]), 1.0, atol=1e-13)
        assert np.allclose(np.asarray(gt["u"][side]["ny"]), 0.0, atol=1e-13)
        assert np.allclose(np.asarray(gt["u"][side]["Jf"]), h / 2, atol=1e-13)
    for side in ("jmin", "jmax"):
        assert np.allclose(np.asarray(gt["u"][side]["ny"]), 1.0, atol=1e-13)


def test_metric_terms_annulus_normals(base_settings):
    """On the O-grid annulus the i-min/max face normals are tangential
    (theta direction) and j-face normals radial; J > 0 everywhere."""
    x, y = generate_annulus_grid(8, 8, 2)
    path = os.path.join(INPUT_DIR, "gen_annulus_8x8_p2.xyz")
    write_plot3d(path, x, y)
    base_settings.update_setting("grid.polynomial_degree", 2)
    base_settings.update_setting("grid.O_grid", True)
    base_settings.update_setting("grid.circular", True)
    geom = Geometry(path, base_settings)
    lvl = GridLevel(geom, base_settings, ["u"], {"u": 2})
    gt = lvl.gt
    assert np.asarray(gt["u"]["e"]["J"]).min() > 0
    # j-face normal should be radial: n . r_hat ~ +-1
    g = gt["u"]["jmax"]
    xs, ys = np.asarray(g["x"]), np.asarray(g["y"])
    r = np.sqrt(xs ** 2 + ys ** 2)
    ndotr = (np.asarray(g["nx"]) * xs + np.asarray(g["ny"]) * ys) / r
    # p=2 elements approximate the arc; normals radial to geometric accuracy
    assert np.allclose(np.abs(ndotr), 1.0, atol=1e-4)


def test_element_coords_ordering():
    x, y = generate_rectangle_grid(2, 2, 1)
    X, Y = element_coords(x, y, 2, 2, 1)
    # m = j*Ni + i; element m=1 -> (i=1, j=0): x in [0,1], y in [-1,0]
    assert X[1].min() == 0.0 and X[1].max() == 1.0
    assert Y[1].min() == -1.0 and Y[1].max() == 0.0
    # intra-element F-order: index a + b*G1, a = i-node
    assert X[0][0] == -1.0 and X[0][1] == 0.0  # a=0,1 at b=0
    assert Y[0][0] == -1.0 and Y[0][2] == 0.0  # a=0 at b=0,1


def test_neighbor_map_periodic_wrap():
    nbr, mask = neighbor_map(4, 3, periodic_i=True)
    # element (0, 1) -> m = 4; iL neighbor wraps to (3, 1) -> m = 7
    assert nbr[4, 1] == 7 and mask[4, 1]
    # j boundaries masked
    assert not mask[0, 3]
    nbr2, mask2 = neighbor_map(4, 3, periodic_i=False)
    assert not mask2[4, 1] or nbr2[4, 1] == 3  # (0,1) has no iL
    assert not mask2[4 * 0 + 0, 1]


def test_ogrid_closure_check(base_settings):
    x, y = generate_annulus_grid(4, 4, 1)
    x[-1, 0] += 1e-3  # break closure
    path = os.path.join(INPUT_DIR, "broken_annulus.xyz")
    write_plot3d(path, x, y)
    base_settings.update_setting("grid.polynomial_degree", 1)
    base_settings.update_setting("grid.O_grid", True)
    with pytest.raises(ValueError, match="O-grid is not closed"):
        Geometry(path, base_settings)
