"""Mesh renderer for MANO visualisation — pure-JAX z-buffer rasteriser.

TPU-native replacement for the reference's OpenDR renderer
(reference lib/utils/renderer.py:1-289 and lib/dataset/frei_utils/renderer.py):
same public surface — ``MeshRenderer(faces, img_size, flength)`` callable with
``(verts, cam=[f, px, py], img=None, do_alpha=..., color_id=...)`` returning a
uint8 image, plus ``rotated``, ``get_alpha``, ``append_alpha``, ``draw_text``
and the same colour palette / three-point Lambertian lighting rig
(reference :152-178: back/left lights at full intensity, right light at 0.7).

Design: instead of OpenDR's C scanline rasteriser we rasterise on the
accelerator.  Triangles are processed in fixed-size chunks; each chunk
computes barycentric coverage and depth for all pixels at once (a
(chunk, H, W) tensor — pure vector math, MXU/VPU friendly, static shapes)
and folds into a running z-buffer with ``lax.fori_loop``.  Colours are
Gouraud-interpolated from per-vertex Lambertian shading.  The whole render
is one jitted function; gradients flow to vertex colours (hard visibility).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

colors = {
    # colourblind/print/copy safe (reference :17-21)
    "light_blue": [0.85882353, 0.74117647, 0.65098039],
    "light_pink": [0.9, 0.7, 0.7],
}


# --------------------------------------------------------------- geometry
def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals from a (V, 3) mesh with (T, 3) faces."""
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    fn = jnp.cross(v1 - v0, v2 - v0)                     # area-weighted
    vn = jnp.zeros_like(verts)
    for i in range(3):
        vn = vn.at[faces[:, i]].add(fn)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=1, keepdims=True), 1e-8)


def lambertian_point_light(verts, normals, albedo, light_pos, light_color):
    """OpenDR LambertianPointLight semantics: albedo * colour * max(n.l, 0)."""
    d = light_pos[None] - verts
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-8)
    lam = jnp.maximum(jnp.sum(d * normals, axis=1, keepdims=True), 0.0)
    return albedo * jnp.asarray(light_color)[None] * lam


def _rotate_y(points: np.ndarray, angle: float) -> np.ndarray:
    ry = np.array([[np.cos(angle), 0.0, np.sin(angle)],
                   [0.0, 1.0, 0.0],
                   [-np.sin(angle), 0.0, np.cos(angle)]])
    return points @ ry


def shade_vertices(verts, faces, color, yrot=math.radians(120)):
    """Three-point lighting rig of the reference's simple_renderer (:152-178)."""
    vn = vertex_normals(verts, faces)
    albedo = jnp.broadcast_to(jnp.asarray(color, jnp.float32)[None],
                              verts.shape)
    vc = jnp.zeros_like(albedo)
    rig = [((-200.0, -100.0, -100.0), (1.0, 1.0, 1.0)),
           ((800.0, 10.0, 300.0), (1.0, 1.0, 1.0)),
           ((-500.0, 500.0, 1000.0), (0.7, 0.7, 0.7))]
    for pos, col in rig:
        lp = jnp.asarray(_rotate_y(np.asarray(pos, np.float64), yrot),
                         jnp.float32)
        vc = vc + lambertian_point_light(verts, vn, albedo, lp, col)
    return jnp.clip(vc, 0.0, 1.0)


# -------------------------------------------------------------- rasteriser
@partial(jax.jit, static_argnames=("height", "width", "chunk"))
def rasterize(verts_cam, faces, vert_colors, f, c, background,
              near=0.1, far=100.0, height: int = 256, width: int = 256,
              chunk: int = 64):
    """Pinhole-project and z-buffer rasterise a triangle mesh.

    verts_cam: (V, 3) camera-space vertices (+z forward, y down — the
        reference's ProjectPoints convention with rt=t=0, :57-63).
    faces: (T, 3) int32.  vert_colors: (V, 3) in [0, 1].
    f, c: focal (2,) and principal point (2,).  background: (H, W, 3).
    Returns (H, W, 3) float32 in [0, 1].
    """
    z = jnp.maximum(verts_cam[:, 2], 1e-6)
    u = f[0] * verts_cam[:, 0] / z + c[0]
    v = f[1] * verts_cam[:, 1] / z + c[1]
    proj = jnp.stack([u, v, verts_cam[:, 2]], axis=1)    # (V, 3)

    t = faces.shape[0]
    pad = (-t) % chunk
    # pad with a degenerate triangle that never wins the depth test
    tri = jnp.concatenate(
        [proj[faces], jnp.full((pad, 3, 3), jnp.inf, proj.dtype)], axis=0)
    col = jnp.concatenate(
        [vert_colors[faces], jnp.zeros((pad, 3, 3), vert_colors.dtype)], axis=0)
    n_chunks = tri.shape[0] // chunk

    ys = jnp.arange(height, dtype=jnp.float32)[None, :, None]   # rows = v
    xs = jnp.arange(width, dtype=jnp.float32)[None, None, :]    # cols = u

    def edge(ax, ay, bx, by, px, py):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

    def body(i, carry):
        zbuf, img = carry
        tc = jax.lax.dynamic_slice_in_dim(tri, i * chunk, chunk)   # (c,3,3)
        cc = jax.lax.dynamic_slice_in_dim(col, i * chunk, chunk)
        x0, y0, z0 = (tc[:, 0, j][:, None, None] for j in range(3))
        x1, y1, z1 = (tc[:, 1, j][:, None, None] for j in range(3))
        x2, y2, z2 = (tc[:, 2, j][:, None, None] for j in range(3))
        denom = edge(x0, y0, x1, y1, x2, y2)
        safe = jnp.where(jnp.abs(denom) < 1e-8, 1.0, denom)
        l0 = edge(x1, y1, x2, y2, xs, ys) / safe                  # (c,H,W)
        l1 = edge(x2, y2, x0, y0, xs, ys) / safe
        l2 = 1.0 - l0 - l1
        inside = ((l0 >= 0) & (l1 >= 0) & (l2 >= 0)
                  & (jnp.abs(denom) >= 1e-8))
        depth = l0 * z0 + l1 * z1 + l2 * z2
        inside = inside & (depth > near) & (depth < far)
        depth = jnp.where(inside, depth, jnp.inf)
        best = jnp.argmin(depth, axis=0)                          # (H,W)
        dmin = jnp.take_along_axis(depth, best[None], axis=0)[0]
        lam = jnp.stack([jnp.take_along_axis(l, best[None], axis=0)[0]
                         for l in (l0, l1, l2)], axis=-1)         # (H,W,3)
        cbest = jnp.take_along_axis(
            cc, best.reshape(-1)[:, None, None], axis=0
        ).reshape(height, width, 3, 3)
        shade = jnp.sum(lam[..., :, None] * cbest, axis=2)        # (H,W,3)
        win = dmin < zbuf
        return (jnp.where(win, dmin, zbuf),
                jnp.where(win[..., None], shade, img))

    zbuf = jnp.full((height, width), jnp.inf)
    zbuf, img = jax.lax.fori_loop(0, n_chunks, body,
                                  (zbuf, background.astype(jnp.float32)))
    return jnp.clip(img, 0.0, 1.0)


# ------------------------------------------------------------- public API
def get_alpha(imtmp, bgval=1.0):
    """Add an alpha channel that is 0 exactly on background pixels (:182-190)."""
    alpha = (~np.all(imtmp == bgval, axis=2)).astype(imtmp.dtype)
    return np.concatenate([imtmp, alpha[..., None]], axis=2)


def append_alpha(imtmp):
    alpha = np.ones_like(imtmp[:, :, :1])
    if np.issubdtype(imtmp.dtype, np.uint8):
        alpha = alpha * 255
    return np.concatenate([imtmp, alpha], axis=2)


def render_model(verts, faces, w, h, f, c, near=0.5, far=25.0,
                 img=None, do_alpha=False, color_id=None):
    """Reference render_model (:202-234): shade, rasterise, alpha rules."""
    if color_id is None:
        color = colors["light_blue"]
    else:
        color = list(colors.values())[color_id % len(colors)]
    verts = jnp.asarray(verts, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    vc = shade_vertices(verts, faces, color)
    if img is not None:
        bg = jnp.asarray(img, jnp.float32)
        bg = bg / 255.0 if float(bg.max()) > 1.0 else bg
    else:
        bg = jnp.ones((h, w, 3), jnp.float32)
    out = np.asarray(rasterize(verts, faces, vc, jnp.asarray(f, jnp.float32),
                               jnp.asarray(c, jnp.float32), bg,
                               near=near, far=far, height=h, width=w))
    if img is None and do_alpha:
        out = get_alpha(out)
    elif img is not None and do_alpha:
        out = append_alpha(out)
    return out


class MeshRenderer:
    """Drop-in equivalent of the reference MeshRenderer (:25-113).

    cam is ``[f, px, py]``; output is uint8 (H, W, 3|4).
    """

    def __init__(self, mesh_faces, img_size: int = 256, flength: float = 500.0):
        self.faces = np.asarray(mesh_faces, np.int32)
        self.w = self.h = img_size
        self.flength = flength

    def __call__(self, verts, cam=None, img=None, do_alpha=False,
                 far=None, near=None, color_id=0, img_size=None):
        if img is not None:
            h, w = img.shape[:2]
        elif img_size is not None:
            h, w = img_size
        else:
            h, w = self.h, self.w
        if cam is None:
            cam = [self.flength, w / 2.0, h / 2.0]
        verts = np.asarray(verts, np.float32)
        if near is None:
            near = max(float(verts[:, 2].min()) - 25.0, 0.1)
        if far is None:
            far = max(float(verts[:, 2].max()) + 25.0, 25.0)
        imtmp = render_model(
            verts, self.faces, w, h,
            f=(cam[0], cam[0]), c=(cam[1], cam[2]),
            near=near, far=far, img=img, do_alpha=do_alpha,
            color_id=color_id)
        return (np.asarray(imtmp, np.float32) * 255).astype(np.uint8)

    def rotated(self, verts, deg, cam=None, axis="y", img=None, do_alpha=True,
                far=None, near=None, color_id=0, img_size=None):
        rad = math.radians(deg)
        cs, sn = math.cos(rad), math.sin(rad)
        if axis == "y":
            rot = np.array([[cs, 0, sn], [0, 1, 0], [-sn, 0, cs]])
        elif axis == "x":
            rot = np.array([[1, 0, 0], [0, cs, -sn], [0, sn, cs]])
        else:
            rot = np.array([[cs, -sn, 0], [sn, cs, 0], [0, 0, 1]])
        center = verts.mean(axis=0)
        new_v = (verts - center) @ rot + center
        return self(new_v, cam, img=img, do_alpha=do_alpha, far=far,
                    near=near, img_size=img_size, color_id=color_id)


def draw_text(input_image, content):
    """Draw 'key: value' lines on an image (reference :265-289)."""
    import cv2

    image = input_image.copy()
    input_is_float = np.issubdtype(image.dtype, np.floating)
    if input_is_float:
        image = (image * 255).astype(np.uint8)
    y = 15
    for key in sorted(content):
        cv2.putText(image, "%s: %.2g" % (key, content[key]), (5, y), 0, 0.45,
                    (0, 0, 0))
        y += 15
    return image.astype(np.float32) / 255.0 if input_is_float else image
