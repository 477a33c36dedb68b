"""JAX z-buffer mesh renderer vs analytic expectations (reference
lib/utils/renderer.py semantics: pinhole cam [f, px, py], white background,
three-light Lambertian shading, alpha rules)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hrnet_hand_pose_estimation_tpu.utils.renderer import (
    MeshRenderer,
    draw_text,
    get_alpha,
    rasterize,
    shade_vertices,
    vertex_normals,
)


def _cube(center=(0.0, 0.0, 5.0), side=2.0):
    c = np.asarray(center, np.float32)
    s = side / 2.0
    verts = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                      for z in (-s, s)], np.float32) + c
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],   # x faces
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],   # y faces
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],   # z faces
    ], np.int32)
    return verts, faces


def _raster(verts, faces, colors_v, size=64, f=64.0):
    return np.asarray(rasterize(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(colors_v),
        jnp.asarray([f, f]), jnp.asarray([size / 2.0, size / 2.0]),
        jnp.ones((size, size, 3)), height=size, width=size, chunk=8))


def test_triangle_coverage_and_background():
    # right triangle at z=2, f=64, c=32: projects to (32,32),(64,32),(32,64)
    verts = np.array([[0, 0, 2], [1, 0, 2], [0, 1, 2]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    red = np.tile([[1.0, 0.0, 0.0]], (3, 1)).astype(np.float32)
    img = _raster(verts, faces, red)
    assert img[40, 40].tolist() == [1.0, 0.0, 0.0]      # inside
    assert img[40, 60].tolist() == [1.0, 1.0, 1.0]      # beyond hypotenuse
    assert img[10, 10].tolist() == [1.0, 1.0, 1.0]      # above the triangle
    # interpolation: barycentric mix of per-vertex colours
    rgb = np.eye(3, dtype=np.float32)
    img2 = _raster(verts, faces, rgb)
    assert abs(img2[33, 33].sum() - 1.0) < 1e-4          # coords sum to 1


def test_zbuffer_occlusion_and_winding():
    # near green triangle occludes far red one; flipped winding still renders
    verts = np.array([[0, 0, 2], [1, 0, 2], [0, 1, 2],
                      [0, 0, 4], [4, 0, 4], [0, 4, 4]], np.float32)
    cols = np.array([[0, 1, 0]] * 3 + [[1, 0, 0]] * 3, np.float32)
    for tri0 in ([0, 1, 2], [0, 2, 1]):
        faces = np.array([tri0, [3, 4, 5]], np.int32)
        img = _raster(verts, faces, cols)
        assert img[40, 40].tolist() == [0.0, 1.0, 0.0]   # near wins
        assert img[40, 60].tolist() == [1.0, 0.0, 0.0]   # far visible outside


def test_vertex_normals_cube():
    verts, faces = _cube()
    vn = np.asarray(vertex_normals(jnp.asarray(verts), jnp.asarray(faces)))
    np.testing.assert_allclose(np.linalg.norm(vn, axis=1), 1.0, atol=1e-5)
    # corner normals point away from the cube centre
    outward = verts - np.array([0, 0, 5.0])
    assert (np.sum(vn * outward, axis=1) > 0).all()


def test_shading_is_bounded_and_nonflat():
    verts, faces = _cube()
    vc = np.asarray(shade_vertices(jnp.asarray(verts), jnp.asarray(faces),
                                   [0.9, 0.7, 0.7]))
    assert vc.min() >= 0.0 and vc.max() <= 1.0
    assert vc.std() > 0.01                               # lights create contrast


def test_mesh_renderer_end_to_end():
    verts, faces = _cube()
    rend = MeshRenderer(faces, img_size=64, flength=64.0)
    img = rend(verts)
    assert img.dtype == np.uint8 and img.shape == (64, 64, 3)
    center, corner = img[32, 32], img[2, 2]
    assert corner.tolist() == [255, 255, 255]            # background white
    assert (center != 255).any()                         # cube covers centre
    # rotation changes the rendering
    rot = rend.rotated(verts, 45.0, do_alpha=False)
    assert (rot != img).any()


def test_mesh_renderer_alpha_and_overlay():
    verts, faces = _cube()
    rend = MeshRenderer(faces, img_size=64, flength=64.0)
    rgba = rend(verts, do_alpha=True)
    assert rgba.shape == (64, 64, 4)
    assert rgba[2, 2, 3] == 0 and rgba[32, 32, 3] == 255  # alpha mask
    bg = np.full((64, 64, 3), 128, np.uint8)
    over = rend(verts, img=bg)
    assert over[2, 2].tolist() == [128, 128, 128]        # bg preserved
    assert (over[32, 32] != 128).any()                   # mesh drawn


def test_get_alpha_and_draw_text():
    im = np.ones((8, 8, 3), np.float32)
    im[2:4, 2:4] = 0.5
    rgba = get_alpha(im)
    assert rgba[0, 0, 3] == 0.0 and rgba[2, 2, 3] == 1.0
    txt = draw_text(np.zeros((64, 64, 3), np.float32), {"auc": 0.91})
    assert txt.shape == (64, 64, 3) and txt.max() <= 1.0
