"""Terrain map assembly + pure JAX height lookup.

TerrainMap reproduces the reference's grid-of-subterrains layout
(reference humanoid/utils/terrain.py:38-164): num_rows difficulty levels x
num_cols terrain types, surrounded by a flat border, env origins at subterrain
centers with z = max height of the central 2x2 m patch.

Two synthesis menus:
- ``style="legged"``: the base Terrain menu (slopes/rough/stairs/obstacles/
  stepping stones/gap/pit, terrain.py:109-145)
- ``style="humanoid"``: HumanoidTerrain's gentler menu (plane/obstacles/
  uniform/slope+-/stairs+-, terrain.py:203-231) — the XBot-L default for
  trimesh mode with proportions [0.2,0.2,0.4,0.1,0.1,0,0].

World convention (matches reference legged_robot.py:777-795): world (x, y) in
meters maps to grid pixel (x + border_size)/horizontal_scale along axis 0.
Height lookup takes the min of the 3 taps (px,py), (px+1,py), (px,py+1).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import primitives as P


@dataclass
class TerrainMap:
    height_field: np.ndarray  # (tot_rows, tot_cols) int16
    horizontal_scale: float
    vertical_scale: float
    border_size: float
    env_origins: np.ndarray  # (num_rows, num_cols, 3) float
    env_length: float
    env_width: float
    num_rows: int
    num_cols: int

    @staticmethod
    def build(cfg, rng: np.random.Generator | None = None, style: str = "humanoid") -> "TerrainMap":
        """cfg: config.base.TerrainCfg."""
        rng = rng or np.random.default_rng(0)
        style = getattr(cfg, "style", style) or style
        w_px = int(cfg.terrain_width / cfg.horizontal_scale)
        l_px = int(cfg.terrain_length / cfg.horizontal_scale)
        border = int(cfg.border_size / cfg.horizontal_scale)
        tot_rows = cfg.num_rows * l_px + 2 * border
        tot_cols = cfg.num_cols * w_px + 2 * border
        hf = np.zeros((tot_rows, tot_cols), dtype=np.int16)
        origins = np.zeros((cfg.num_rows, cfg.num_cols, 3))
        proportions = np.cumsum(cfg.terrain_proportions).tolist()

        selected = bool(getattr(cfg, "selected", False))
        # Froude HEIGHT-amplitude scale (config/base.py froude_scale):
        # menu height constants multiply by fs at synthesis time; slopes
        # are dimensionless and horizontal extents stay (they set exposure
        # per episode, which the command/time scaling already matches).
        # `selected` mode passes user kwargs through verbatim (explicit
        # absolute geometry is the point of that mode).
        fs = float(getattr(cfg, "froude_scale", 1.0))
        for i in range(cfg.num_rows):
            for j in range(cfg.num_cols):
                if cfg.curriculum:
                    difficulty = i / cfg.num_rows
                    choice = j / cfg.num_cols + 0.001
                elif style == "humanoid":
                    choice = rng.uniform(0, 1)
                    difficulty = rng.uniform(0, 1)
                else:
                    choice = rng.uniform(0, 1)
                    difficulty = rng.choice([0.5, 0.75, 0.9])
                g = P.SubGrid(l_px, w_px, cfg.horizontal_scale, cfg.vertical_scale)
                if selected:
                    _selected_menu(g, rng, cfg.terrain_kwargs)
                elif style == "humanoid":
                    _humanoid_menu(g, rng, choice, difficulty, proportions, fs)
                elif style == "rubble":
                    _rubble_menu(
                        g, rng, choice, difficulty, proportions,
                        base=getattr(cfg, "rubble_base", 0.05) * fs,
                        span=getattr(cfg, "rubble_span", 0.30) * fs,
                        fs=fs,
                    )
                elif style == "deploy":
                    _deploy_menu(
                        g, rng, choice, difficulty, proportions,
                        mjcf=getattr(cfg, "deploy_mjcf", None),
                        base=getattr(cfg, "rubble_base", 0.05),
                        span=getattr(cfg, "rubble_span", 0.30),
                        fs=fs,
                    )
                else:
                    _legged_menu(g, rng, choice, difficulty, proportions, fs)
                x0 = border + i * l_px
                y0 = border + j * w_px
                hf[x0 : x0 + l_px, y0 : y0 + w_px] = g.hf
                # origin: center of patch; z from the central 2x2 m
                ox = (i + 0.5) * cfg.terrain_length
                oy = (j + 0.5) * cfg.terrain_width
                cx1 = int((cfg.terrain_length / 2.0 - 1) / cfg.horizontal_scale)
                cx2 = int((cfg.terrain_length / 2.0 + 1) / cfg.horizontal_scale)
                cy1 = int((cfg.terrain_width / 2.0 - 1) / cfg.horizontal_scale)
                cy2 = int((cfg.terrain_width / 2.0 + 1) / cfg.horizontal_scale)
                oz = np.max(g.hf[cx1:cx2, cy1:cy2]) * cfg.vertical_scale
                origins[i, j] = [ox, oy, oz]

        return TerrainMap(
            height_field=hf,
            horizontal_scale=cfg.horizontal_scale,
            vertical_scale=cfg.vertical_scale,
            border_size=cfg.border_size,
            env_origins=origins,
            env_length=cfg.terrain_length,
            env_width=cfg.terrain_width,
            num_rows=cfg.num_rows,
            num_cols=cfg.num_cols,
        )


# name -> (primitive fn, needs rng). Keys accept both the local primitive
# names and the reference's Isaac `terrain_utils` names ("*_terrain"), since
# the reference's terrain_kwargs carries the latter (terrain.py:94-107 pops
# `type` and eval()s it; here it is a plain dict lookup — no eval).
_SELECTED_PRIMS = {
    "random_uniform": (P.random_uniform, True),
    "pyramid_sloped": (P.pyramid_sloped, False),
    "pyramid_stairs": (P.pyramid_stairs, False),
    "discrete_obstacles": (P.discrete_obstacles, True),
    "stepping_stones": (P.stepping_stones, True),
    "gap": (P.gap, False),
    "pit": (P.pit, False),
}


def _selected_menu(g, rng, terrain_kwargs):
    """`cfg.terrain.selected` mode (reference terrain.py:94-107): every
    subterrain is ONE named primitive with `terrain_kwargs` as its
    arguments. Reproduces the capability, not the reference's bugs (its
    `eval(terrain_type)` and destructive `.pop` of a doubly-nested
    `terrain_kwargs.terrain_kwargs`): dispatch is a dict lookup and the
    caller's kwargs dict is copied, never mutated."""
    kwargs = dict(terrain_kwargs or {})
    name = kwargs.pop("type", None)
    if not name:
        raise ValueError(
            "terrain.selected=True requires terrain_kwargs={'type': <name>, ...}"
        )
    key = name[: -len("_terrain")] if name.endswith("_terrain") else name
    if key not in _SELECTED_PRIMS:
        raise ValueError(
            f"unknown selected terrain type {name!r}; "
            f"known: {sorted(_SELECTED_PRIMS)}"
        )
    fn, needs_rng = _SELECTED_PRIMS[key]
    if needs_rng:
        fn(g, rng, **kwargs)
    else:
        fn(g, **kwargs)


def _legged_menu(g, rng, choice, difficulty, prop, fs=1.0):
    """Base Terrain menu (reference terrain.py:109-145). fs scales the
    height amplitudes (Froude; slopes and horizontal extents stay)."""
    slope = difficulty * 0.4
    step_height = (0.05 + 0.18 * difficulty) * fs
    obstacle_h = (0.05 + difficulty * 0.2) * fs
    stone_size = 1.5 * (1.05 - difficulty)
    stone_dist = 0.05 if difficulty == 0 else 0.1
    gap_size = 1.0 * difficulty
    pit_depth = 1.0 * difficulty * fs
    prop = prop + [1.0] * (7 - len(prop))
    if choice < prop[0]:
        if choice < prop[0] / 2:
            slope = -slope
        P.pyramid_sloped(g, slope=slope, platform_size=3.0)
    elif choice < prop[1]:
        P.pyramid_sloped(g, slope=slope, platform_size=3.0)
        P.random_uniform(
            g, rng, -0.05 * fs, 0.05 * fs, step=0.005, downsampled_scale=0.2
        )
    elif choice < prop[3]:
        if choice < prop[2]:
            step_height = -step_height
        P.pyramid_stairs(g, step_width=0.31, step_height=step_height, platform_size=3.0)
    elif choice < prop[4]:
        P.discrete_obstacles(g, rng, obstacle_h, 1.0, 2.0, 20, platform_size=3.0)
    elif choice < prop[5]:
        P.stepping_stones(g, rng, stone_size, stone_dist, max_height=0.0, platform_size=4.0)
    elif choice < prop[6]:
        P.gap(g, gap_size=gap_size, platform_size=3.0)
    else:
        P.pit(g, depth=pit_depth, platform_size=4.0)


def _rubble_menu(g, rng, choice, difficulty, prop, base=0.05, span=0.30,
                 fs=1.0):
    """Deployment-matched coarse unevenness (EXTENSION, no reference
    analog): the MuJoCo sim2sim terrain (uneven.png hfield,
    XBot-L-terrain.xml) is a 1 m grid of random heights in [0, 0.35] m,
    triangulated into random ~20-35 deg ramps — far beyond the reference
    humanoid menu's +-0.07 m roughness. This menu trains directly on that
    family: coarse random cells whose amplitude grows with curriculum
    difficulty, plus a slice of the gentle humanoid roughness so the
    baseline gait keeps training. prop[0] of the columns stay gentle;
    the rest are rubble. Caller pre-scales base/span by the Froude factor;
    fs scales the gentle slice."""
    if choice < prop[0]:
        r_height = difficulty * 0.07 * fs
        P.random_uniform(g, rng, -r_height, r_height, step=0.005,
                         downsampled_scale=0.2)
    else:
        max_h = base + span * difficulty  # top level ~ deployment's 0.35
        P.random_uniform(g, rng, 0.0, max_h, step=0.01,
                         downsampled_scale=1.0)


_DEPLOY_FIELD_CACHE: dict = {}
from humanoid_gym_tpu import XBOT_TERRAIN_MJCF as _DEFAULT_DEPLOY_MJCF


def _load_deploy_field(mjcf_path: str):
    """Load the DEPLOYMENT heightfield (the MuJoCo sim2sim terrain) via
    mujoco's own loader (PNG decoding + hfield scaling), as (heights_m
    indexed [x, y], cell_x_m, cell_y_m). Cached per path.

    MuJoCo stores hfield_data (nrow, ncol) with rows spanning y and cols
    spanning x (same convention sim2sim._hfield_height_at verified against
    mj_ray), so the grid is transposed here to match SubGrid.hf's
    (x-pixels, y-pixels) layout, with per-axis cell sizes — deploy fields
    need not be square."""
    if mjcf_path in _DEPLOY_FIELD_CACHE:
        return _DEPLOY_FIELD_CACHE[mjcf_path]
    import mujoco

    from ..export.sim2sim import _load_mj_model

    m = _load_mj_model(mjcf_path)
    gid = next(
        g for g in range(m.ngeom)
        if m.geom_type[g] == mujoco.mjtGeom.mjGEOM_HFIELD
    )
    hid = int(m.geom_dataid[gid])
    sx, sy, sz, _ = m.hfield_size[hid]
    nr, nc = int(m.hfield_nrow[hid]), int(m.hfield_ncol[hid])
    adr = int(m.hfield_adr[hid])
    h = np.asarray(m.hfield_data[adr : adr + nr * nc]).reshape(nr, nc) * sz
    h_xy = np.ascontiguousarray(h.T)  # (nc, nr), indexed [x, y]
    cell_x = 2.0 * float(sx) / (nc - 1)
    cell_y = 2.0 * float(sy) / (nr - 1)
    _DEPLOY_FIELD_CACHE[mjcf_path] = (h_xy, cell_x, cell_y)
    return h_xy, cell_x, cell_y


def _deploy_menu(g, rng, choice, difficulty, prop, mjcf=None, base=0.05,
                 span=0.30, fs=1.0):
    """Deployment-matched terrain (EXTENSION): random windows of the ACTUAL
    MuJoCo sim2sim heightfield (uneven.png), bilinearly upsampled to the
    training grid, amplitude ramped with curriculum difficulty. prop[0] of
    the columns stay gentle reference-style roughness (gait quality).

    Froude note: window heights take their absolute scale from the FIELD
    (a scaled morphology must point `deploy_mjcf` at its scaled terrain
    model, e.g. XBot-S-terrain.xml); the (base + span*difficulty)/0.35
    amplitude ramp is a fraction and is scale-invariant. Only the gentle
    slice's absolute roughness takes fs directly."""
    if choice < prop[0]:
        r_height = difficulty * 0.07 * fs
        P.random_uniform(g, rng, -r_height, r_height, step=0.005,
                         downsampled_scale=0.2)
        return
    h, cell_x, cell_y = _load_deploy_field(mjcf or _DEFAULT_DEPLOY_MJCF)
    # window of the field covering the subgrid's world extent
    # (SubGrid.hf is (width, length) = (x-pixels, y-pixels); h is [x, y])
    wl = g.width * g.horizontal_scale / cell_x
    ww = g.length * g.horizontal_scale / cell_y
    nx, ny = h.shape
    if wl > nx - 1 or ww > ny - 1:
        raise ValueError(
            f"deploy field ({(nx - 1) * cell_x:.0f}x{(ny - 1) * cell_y:.0f} m)"
            f" is smaller than the terrain patch "
            f"({g.width * g.horizontal_scale:.0f}x"
            f"{g.length * g.horizontal_scale:.0f} m)"
        )
    r0 = rng.uniform(0, nx - 1 - wl)
    c0 = rng.uniform(0, ny - 1 - ww)
    # upsample at the fine grid with MuJoCo's TRIANGULATED interpolation
    # (cells split along the (i, j)->(i+1, j+1) diagonal — verified vs
    # mj_ray; bilinear deviates up to 0.14 m on the 1 m deployment cells)
    xi = r0 + np.linspace(0.0, wl, g.width)
    yi = c0 + np.linspace(0.0, ww, g.length)
    x0 = np.floor(xi).astype(int)
    y0 = np.floor(yi).astype(int)
    x1 = np.minimum(x0 + 1, nx - 1)
    y1 = np.minimum(y0 + 1, ny - 1)
    fx = (xi - x0)[:, None]
    fy = (yi - y0)[None, :]
    h00 = h[np.ix_(x0, y0)]
    h10 = h[np.ix_(x1, y0)]
    h01 = h[np.ix_(x0, y1)]
    h11 = h[np.ix_(x1, y1)]
    lower = h00 + (h10 - h00) * fx + (h11 - h10) * fy
    upper = h00 + (h01 - h00) * fy + (h11 - h01) * fx
    win = np.where(fx >= fy, lower, upper)
    win = win - win.min()
    amp = np.clip((base + span * difficulty) / 0.35, 0.0, 1.0)
    g.hf[:, :] = np.round(win * amp / g.vertical_scale).astype(np.int16)


def _humanoid_menu(g, rng, choice, difficulty, prop, fs=1.0):
    """HumanoidTerrain menu (reference terrain.py:203-231). fs scales the
    height amplitudes (Froude; the slope is dimensionless and stays)."""
    obstacle_h = difficulty * 0.04 * fs
    r_height = difficulty * 0.07 * fs
    h_slope = difficulty * 0.15
    prop = prop + [1.0] * (7 - len(prop))
    if choice < prop[0]:
        pass  # flat
    elif choice < prop[1]:
        P.discrete_obstacles(g, rng, obstacle_h, 1.0, 2.0, 20, platform_size=3.0)
    elif choice < prop[2]:
        P.random_uniform(g, rng, -r_height, r_height, step=0.005, downsampled_scale=0.2)
    elif choice < prop[3]:
        P.pyramid_sloped(g, slope=h_slope, platform_size=0.1)
    elif choice < prop[4]:
        P.pyramid_sloped(g, slope=-h_slope, platform_size=0.1)
    elif choice < prop[5]:
        P.pyramid_stairs(g, step_width=0.4, step_height=obstacle_h, platform_size=1.0)
    elif choice < prop[6]:
        P.pyramid_stairs(g, step_width=0.4, step_height=-obstacle_h, platform_size=1.0)


def make_height_fn(tmap: TerrainMap):
    """Pure JAX height lookup h(x, y) closed over the heightfield.

    Reproduces the reference's sampling semantics (legged_robot.py:782-795):
    integer floor indexing after border shift, 3-tap min filter, clip to grid.
    Returns a function mapping world-frame (x, y) arrays -> heights (meters).
    """
    import jax.numpy as jnp

    hf = jnp.asarray(tmap.height_field, jnp.float32)
    inv_h = 1.0 / tmap.horizontal_scale
    border = tmap.border_size
    vscale = tmap.vertical_scale
    nrow, ncol = tmap.height_field.shape

    def height_fn(x: "jnp.ndarray", y: "jnp.ndarray") -> "jnp.ndarray":
        px = jnp.clip(((x + border) * inv_h).astype(jnp.int32), 0, nrow - 2)
        py = jnp.clip(((y + border) * inv_h).astype(jnp.int32), 0, ncol - 2)
        h1 = hf[px, py]
        h2 = hf[px + 1, py]
        h3 = hf[px, py + 1]
        return jnp.minimum(jnp.minimum(h1, h2), h3) * vscale

    return height_fn


def make_contact_height_fn(tmap: TerrainMap):
    """Pure JAX BILINEAR terrain height for CONTACT resolution.

    The reference's 3-tap-min floor-indexed lookup (`make_height_fn`) is
    the frozen contract for OBSERVATION heights (legged_robot.py:782-795),
    but as contact geometry it turns every slope into 10 cm terraces —
    feet always land on locally flat mini-ledges, which hides slope
    dynamics entirely (measured: policies that fall on the MuJoCo hfield
    survive terraced in-engine replicas). Contacts use the continuous
    bilinear surface instead — the same family as MuJoCo's triangulated
    hfield prisms and PhysX trimesh collision."""
    import jax.numpy as jnp

    hf = jnp.asarray(tmap.height_field, jnp.float32) * tmap.vertical_scale
    inv_h = 1.0 / tmap.horizontal_scale
    border = tmap.border_size
    nrow, ncol = tmap.height_field.shape

    def height_fn(x: "jnp.ndarray", y: "jnp.ndarray") -> "jnp.ndarray":
        gx = jnp.clip((x + border) * inv_h, 0.0, nrow - 1.001)
        gy = jnp.clip((y + border) * inv_h, 0.0, ncol - 1.001)
        x0 = gx.astype(jnp.int32)
        y0 = gy.astype(jnp.int32)
        fx = gx - x0
        fy = gy - y0
        h00 = hf[x0, y0]
        h10 = hf[x0 + 1, y0]
        h01 = hf[x0, y0 + 1]
        h11 = hf[x0 + 1, y0 + 1]
        return (
            h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
            + h01 * (1 - fx) * fy + h11 * fx * fy
        )

    return height_fn


def make_grad_fn(tmap: TerrainMap):
    """Pure JAX terrain slope (dh/dx, dh/dy) of the BILINEAR contact
    surface at world (x, y) — the gradient of `make_contact_height_fn`'s
    cell, so contact frames tilt consistently with the height the solver
    feels. Used to build sloped contact normals (PhysX-trimesh-normal
    capability analog)."""
    import jax.numpy as jnp

    hf = jnp.asarray(tmap.height_field, jnp.float32) * tmap.vertical_scale
    inv_h = 1.0 / tmap.horizontal_scale
    border = tmap.border_size
    nrow, ncol = tmap.height_field.shape

    def grad_fn(x: "jnp.ndarray", y: "jnp.ndarray"):
        gx_ = jnp.clip((x + border) * inv_h, 0.0, nrow - 1.001)
        gy_ = jnp.clip((y + border) * inv_h, 0.0, ncol - 1.001)
        x0 = gx_.astype(jnp.int32)
        y0 = gy_.astype(jnp.int32)
        fx = gx_ - x0
        fy = gy_ - y0
        h00 = hf[x0, y0]
        h10 = hf[x0 + 1, y0]
        h01 = hf[x0, y0 + 1]
        h11 = hf[x0 + 1, y0 + 1]
        gx = ((h10 - h00) * (1 - fy) + (h11 - h01) * fy) * inv_h
        gy = ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) * inv_h
        return gx, gy

    return grad_fn


def flat_height_fn(x, y):
    """Plane terrain (reference mesh_type='plane', XBot default)."""
    import jax.numpy as jnp

    return jnp.zeros_like(jnp.asarray(x))


# ---- single-tile window machinery (round 3) --------------------------------
# Pointwise gathers from the full height grid cost ~10 ns/element on TPU
# (~40 ms/iter per tap set at 4096 envs — docs/ROUND3.md). The grid is
# pre-blocked into contiguous (BR, BC) tiles at 4 row offsets (stride 12)
# x 2 column offsets (stride 64): any +-reach span around a center fits
# entirely inside ONE tile of the right offset copy, so a batch of envs
# gathers one contiguous 24 KB chunk each, and individual node taps become
# exact one-hot einsums from the tile.

_TILE_CACHE: dict = {}


def make_tile_gather(tmap: TerrainMap, reach_m: float = 1.6):
    """Returns (win_fn, meta) where win_fn(cbx, cby) -> (win, bx, by):
    cbx/cby are clipped integer node coordinates of the window center
    (scalar or batched); `win` is the RAW (unscaled int16-valued f32)
    (BR, BC) tile guaranteed to contain every node in [c - RN, c + RN];
    bx/by are its global node origin. meta = (RN, BR, BC). Cached per
    TerrainMap.

    Raw values are the point (round 5): every tap site one-hot-selects
    from the tile with `Precision.HIGH` (3-pass bf16 on TPU instead of
    HIGHEST's 6-pass f32) and multiplies by vertical_scale AFTERWARD.
    Exactness argument: a one-hot row r and an integer-valued column v
    with |v| < 2^16 satisfy bf16x3(r . v) = v EXACTLY — the 3-pass
    product keeps r_hi*v_hi + r_hi*v_lo, r_hi = 1.0 and v_hi + v_lo
    reconstructs any 16-bit integer exactly (v_lo's residual needs <= 8
    significand bits), with exact-zero terms elsewhere and f32
    accumulation. Scaling after selection performs the identical
    f32 multiply (v * vertical_scale) a pre-scaled tile would have
    stored, so tap values stay bit-identical to direct grid gathers.
    Empirically pinned on real TPU hardware (HIGH vs HIGHEST vs direct
    gather equality at 4096 envs, round-5 docs)."""
    import jax.numpy as jnp

    key = (id(tmap), round(reach_m, 3))
    hit = _TILE_CACHE.get(key)
    if hit is not None:
        return hit

    BC, SC = 128, 64
    inv_h = 1.0 / tmap.horizontal_scale
    RN = int(np.ceil(reach_m * inv_h)) + 2
    # smallest row-tile that guarantees the reach (round 5): short-reach
    # consumers (the 8 base probe points, reach ~0.65 m) gather a (24,128)
    # 12 KB window instead of the contact path's (48,128) 24 KB one —
    # the gather is the probe stage's dominant cost and scales with rows
    for BR, SR in ((24, 8), (32, 8), (48, 12), (64, 16), (96, 24)):
        if BR - 2 * RN >= SR - 1 and BC - 2 * RN >= SC - 1:
            break
    assert BR - 2 * RN >= SR - 1 and BC - 2 * RN >= SC - 1, (RN, BR, BC)
    nrow, ncol = tmap.height_field.shape
    nbr2 = nrow // BR + 2
    nbc2 = ncol // BC + 2
    # int16 storage (round 5): the raw grid IS int16 — tiles at half the
    # f32 bytes (the blocked copies are large embedded constants and the
    # axon remote-compile tunnel rejects oversized payloads), converted
    # to f32 AFTER each per-env window gather (exact)
    pad = np.zeros((nrow + 3 * BR, ncol + 3 * BC), np.int16)
    pad[:nrow, :ncol] = np.asarray(tmap.height_field, np.int16)
    Pgb = jnp.asarray(
        np.ascontiguousarray(
            np.stack(
                [
                    np.stack(
                        [
                            pad[
                                SR * dr : SR * dr + nbr2 * BR,
                                SC * dc : SC * dc + nbc2 * BC,
                            ]
                            .reshape(nbr2, BR, nbc2, BC)
                            .transpose(0, 2, 1, 3)
                            for dc in range(BC // SC)
                        ]
                    )
                    for dr in range(BR // SR)
                ]
            )
        )
    )  # (4, 2, nbr2, nbc2, BR, BC), each (BR, BC) tile contiguous

    def win_fn(cbx, cby):
        sr = (jnp.maximum(cbx - RN, 0) // SR) * SR
        sc = (jnp.maximum(cby - RN, 0) // SC) * SC
        dr = (sr % BR) // SR
        dc = (sc % BC) // SC
        win = Pgb[dr, dc, sr // BR, sc // BC].astype(jnp.float32)
        return win, sr, sc

    out = (win_fn, (RN, BR, BC))
    _TILE_CACHE[key] = out
    return out


def make_tile_height_fn(tmap: TerrainMap, reach_m: float = 1.6):
    """Windowed variant of `make_height_fn` (the frozen 3-tap-min
    OBSERVATION contract): h_fn(cx, cy, xs, ys) returns the same heights
    for every query within reach_m of the center (cx, cy), but all taps
    come from one contiguous tile gather instead of three pointwise grid
    gathers.

    Round 5: the two row one-hots ride ONE stacked einsum (half the
    batched-matmul launches) at Precision.HIGH over the RAW integer tile
    (exact — see make_tile_gather), and the min is taken on raw values
    before the single vertical_scale multiply — which is exactly
    make_height_fn's formula, so values match it bit-for-bit."""
    import jax
    import jax.numpy as jnp

    win_fn, (RN, BR, BC) = make_tile_gather(tmap, reach_m)
    inv_h = 1.0 / tmap.horizontal_scale
    border = tmap.border_size
    vscale = tmap.vertical_scale
    nrow, ncol = tmap.height_field.shape
    hi = jax.lax.Precision.HIGH
    iw = jnp.arange(BR)
    ic = jnp.arange(BC)

    def height_fn(cx, cy, xs, ys):
        cbx = jnp.clip((cx + border) * inv_h, 0.0, nrow - 1.001).astype(
            jnp.int32
        )
        cby = jnp.clip((cy + border) * inv_h, 0.0, ncol - 1.001).astype(
            jnp.int32
        )
        win, bx, by = win_fn(cbx, cby)
        px = jnp.clip(((xs + border) * inv_h).astype(jnp.int32), 0, nrow - 2)
        py = jnp.clip(((ys + border) * inv_h).astype(jnp.int32), 0, ncol - 2)
        rx = jnp.clip(px - bx, 0, BR - 2)
        ry = jnp.clip(py - by, 0, BC - 2)
        rOH = jnp.concatenate(
            [
                (iw == rx[..., None]).astype(jnp.float32),
                (iw == (rx + 1)[..., None]).astype(jnp.float32),
            ],
            axis=-2,
        )  # (..., 2K, BR)
        c0 = (ic == ry[..., None]).astype(jnp.float32)
        c1 = (ic == (ry + 1)[..., None]).astype(jnp.float32)
        t = jnp.einsum("...kw,...wv->...kv", rOH, win, precision=hi)
        K = rx.shape[-1]
        t0 = t[..., :K, :]
        t1 = t[..., K:, :]
        h1 = jnp.sum(t0 * c0, axis=-1)
        h2 = jnp.sum(t1 * c0, axis=-1)
        h3 = jnp.sum(t0 * c1, axis=-1)
        return jnp.minimum(jnp.minimum(h1, h2), h3) * vscale

    return height_fn
