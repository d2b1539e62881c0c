"""Terrain synthesis + height lookup tests."""

import numpy as np

from humanoid_gym_tpu.config.base import TerrainCfg
from humanoid_gym_tpu.terrain import TerrainMap, make_height_fn
from humanoid_gym_tpu.terrain import primitives as P


def _small_cfg():
    cfg = TerrainCfg()
    cfg.num_rows = 3
    cfg.num_cols = 4
    cfg.terrain_length = 4.0
    cfg.terrain_width = 4.0
    cfg.border_size = 5.0
    cfg.curriculum = True
    cfg.terrain_proportions = [0.2, 0.2, 0.4, 0.1, 0.1, 0, 0]
    return cfg


def test_terrain_map_layout():
    cfg = _small_cfg()
    tmap = TerrainMap.build(cfg, np.random.default_rng(0))
    l_px = int(cfg.terrain_length / cfg.horizontal_scale)
    w_px = int(cfg.terrain_width / cfg.horizontal_scale)
    border = int(cfg.border_size / cfg.horizontal_scale)
    assert tmap.height_field.shape == (
        3 * l_px + 2 * border,
        4 * w_px + 2 * border,
    )
    assert tmap.env_origins.shape == (3, 4, 3)
    # origins at patch centers
    np.testing.assert_allclose(tmap.env_origins[0, 0, :2], [2.0, 2.0])
    np.testing.assert_allclose(tmap.env_origins[2, 3, :2], [10.0, 14.0])
    # border is flat zero
    assert np.all(tmap.height_field[:border, :] == 0)


def test_height_fn_matches_grid():
    cfg = _small_cfg()
    tmap = TerrainMap.build(cfg, np.random.default_rng(1))
    hfn = make_height_fn(tmap)
    # sample at exact grid points inside a patch; verify 3-tap min semantics
    xs = np.asarray([0.0, 1.7, 6.3])
    ys = np.asarray([0.0, 2.2, 9.1])
    got = np.asarray(hfn(xs, ys))
    for x, y, h in zip(xs, ys, got):
        px = int((x + cfg.border_size) / cfg.horizontal_scale)
        py = int((y + cfg.border_size) / cfg.horizontal_scale)
        hf = tmap.height_field
        expect = min(hf[px, py], hf[px + 1, py], hf[px, py + 1]) * cfg.vertical_scale
        np.testing.assert_allclose(h, expect, atol=1e-6)


def test_primitives_bounds():
    rng = np.random.default_rng(2)
    g = P.SubGrid(80, 80, 0.1, 0.005)
    P.random_uniform(g, rng, -0.05, 0.05)
    assert np.abs(g.hf).max() * 0.005 <= 0.055
    g2 = P.SubGrid(80, 80, 0.1, 0.005)
    P.pyramid_sloped(g2, slope=0.2, platform_size=1.0)
    # center highest for positive slope, edge 0
    assert g2.hf[40, 40] >= g2.hf[0, 0] == 0
    g3 = P.SubGrid(80, 80, 0.1, 0.005)
    P.pyramid_stairs(g3, step_width=0.4, step_height=0.05, platform_size=1.0)
    assert g3.hf.max() > 0 and g3.hf[0, 0] == 0
    g4 = P.SubGrid(80, 80, 0.1, 0.005)
    P.pit(g4, depth=0.5, platform_size=2.0)
    assert g4.hf.min() == -100  # 0.5 m / 0.005


def test_rubble_style():
    """Deployment-matched rubble menu (EXTENSION): difficulty-ramped coarse
    unevenness approaching the MuJoCo uneven.png hfield's 0.35 m cells;
    curriculum rows get monotonically rougher; origins sit on the terrain."""
    from humanoid_gym_tpu.config.base import TerrainCfg
    from humanoid_gym_tpu.terrain.terrain import TerrainMap

    cfg = TerrainCfg()
    cfg.style = "rubble"
    cfg.curriculum = True
    cfg.terrain_proportions = [0.3]
    cfg.num_rows = 10
    cfg.num_cols = 6
    cfg.border_size = 5.0
    tmap = TerrainMap.build(cfg, np.random.default_rng(0))
    hf = tmap.height_field * cfg.vertical_scale
    assert 0.25 < hf.max() <= 0.36, hf.max()
    l_px = int(cfg.terrain_length / cfg.horizontal_scale)
    b = int(cfg.border_size / cfg.horizontal_scale)
    p99 = [
        np.quantile(hf[b + i * l_px : b + (i + 1) * l_px, b:-b], 0.99)
        for i in range(cfg.num_rows)
    ]
    assert p99[9] > p99[4] > p99[0], p99  # rows get rougher with level
    # origins: z equals the max of the central 2x2 m patch (spawn safe)
    oz = tmap.env_origins[9, :, 2]
    assert np.all(oz >= 0.0) and oz.max() > 0.05


def test_deploy_terrain_style():
    """'deploy' terrain: random windows of the ACTUAL MuJoCo sim2sim
    heightfield (uneven.png via mujoco's loader), amplitude ramped by
    difficulty; gentle columns stay reference-style roughness."""
    import numpy as np

    from humanoid_gym_tpu.config.base import TerrainCfg
    from humanoid_gym_tpu.terrain.terrain import TerrainMap

    cfg = TerrainCfg()
    cfg.mesh_type = "trimesh"
    cfg.curriculum = True
    cfg.style = "deploy"
    cfg.num_rows = 4
    cfg.num_cols = 4
    cfg.terrain_length = 5.0
    cfg.terrain_width = 8.0
    cfg.border_size = 2.0
    cfg.terrain_proportions = [0.25]
    cfg.rubble_base = 0.05
    cfg.rubble_span = 0.30
    tmap = TerrainMap.build(cfg, np.random.default_rng(3))
    h = tmap.height_field.astype(np.float64) * tmap.vertical_scale
    assert h.shape[0] > 0
    # hardest row's deploy cells reach deployment-scale amplitude
    assert h.max() > 0.15, h.max()
    # easiest row stays gentle
    border = int(cfg.border_size / cfg.horizontal_scale)
    l_px = int(cfg.terrain_length / cfg.horizontal_scale)
    row0 = h[border : border + l_px]
    assert row0.max() - row0.min() < 0.16, (row0.min(), row0.max())
    # gentle columns are the only negative cells (+-roughness); deploy
    # windows are re-floored at 0
    assert h.min() >= -0.08


def test_deploy_window_matches_deployment_lookup():
    """The deploy-style window must reproduce the ACTUAL deployment
    surface: _load_deploy_field is indexed [x, y] with per-axis cell sizes
    (MuJoCo hfield rows span y, cols span x), and the menu's triangulated
    upsample agrees with sim2sim._hfield_height_at — the mj_ray-verified
    deployment lookup — at the window's world points. Regression for the
    transposed-window bug (training x mapped onto the field's row axis)."""
    import mujoco
    import numpy as np

    from humanoid_gym_tpu.export.sim2sim import (
        _hfield_height_at, _load_mj_model)
    from humanoid_gym_tpu.terrain.primitives import SubGrid
    from humanoid_gym_tpu.terrain.terrain import (
        _DEFAULT_DEPLOY_MJCF, _deploy_menu, _load_deploy_field)

    model = _load_mj_model(_DEFAULT_DEPLOY_MJCF)
    h, cell_x, cell_y = _load_deploy_field(_DEFAULT_DEPLOY_MJCF)
    gid = next(
        g for g in range(model.ngeom)
        if model.geom_type[g] == mujoco.mjtGeom.mjGEOM_HFIELD
    )
    hid = int(model.geom_dataid[gid])
    px, py = (float(v) for v in model.geom_pos[gid][:2])
    sx, sy = (float(v) for v in model.hfield_size[hid][:2])

    class _PinnedRng:
        """uniform() pinned so the window start is a known grid point."""

        def __init__(self, r0, c0):
            self.vals = [r0, c0]

        def uniform(self, lo, hi):
            v = self.vals.pop(0)
            assert lo <= v <= hi
            return v

    g = SubGrid(width=40, length=64, horizontal_scale=0.25,
                vertical_scale=0.005)
    r0, c0 = 7.25, 11.5
    # base + span = 0.35 -> amp exactly 1.0 (raw deployment heights)
    _deploy_menu(g, _PinnedRng(r0, c0), choice=0.9, difficulty=1.0,
                 prop=[0.0], base=0.05, span=0.30)
    win = g.hf.astype(np.float64) * g.vertical_scale

    wl = g.width * g.horizontal_scale / cell_x
    ww = g.length * g.horizontal_scale / cell_y
    samples = [(i, j) for i in range(0, g.width, 7)
               for j in range(0, g.length, 9)]
    expected = {}
    for i, j in samples:
        gx = r0 + wl * i / (g.width - 1)
        gy = c0 + ww * j / (g.length - 1)
        wx = gx * cell_x - sx + px
        wy = gy * cell_y - sy + py
        expected[(i, j)] = _hfield_height_at(model, wx, wy)
    # the window is re-floored at its min, so compare differences
    i0, j0 = samples[0]
    for i, j in samples[1:]:
        got = win[i, j] - win[i0, j0]
        want = expected[(i, j)] - expected[(i0, j0)]
        assert abs(got - want) < 2.5 * g.vertical_scale, (i, j, got, want)


def test_survival_curriculum_promotes_standing_survivor():
    """curriculum_mode='survival' (EXTENSION, config/base.py): an env that
    reaches timeout at ~zero command must PROMOTE (standing survival is the
    skill the deployment hfield demands); the reference distance rule would
    hold it at its level forever (walked 0 m < terrain_length/2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from humanoid_gym_tpu import registry

    def ov(c):
        c.terrain.curriculum_mode = "survival"
        c.terrain.num_rows = 6
        c.terrain.max_init_terrain_level = 1
        c.terrain.rubble_base = 0.0
        c.terrain.rubble_span = 0.0  # flat "rubble" so standing survives
        c.env.episode_length_s = 1.5
        c.commands.ranges.lin_vel_x = [0.0, 0.0]
        c.commands.ranges.lin_vel_y = [0.0, 0.0]
        c.commands.ranges.ang_vel_yaw = [0.0, 0.0]
        c.commands.heading_command = False
        c.domain_rand.push_robots = False

    env, _ = registry.make_env("humanoid_ppo_rubble", num_envs=2, cfg_overrides=ov)
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    st = jax.jit(env.init_state)(keys, jnp.arange(2))
    lvl0 = np.asarray(st.terrain_level).copy()
    step = jax.jit(env.step)
    # PD holds the default pose; two timeout cycles pass (~1.5 s episodes)
    for _ in range(340):
        st, tr = step(st, jnp.zeros((2, 12)))
    lvl = np.asarray(st.terrain_level)
    assert (lvl > lvl0).any(), (lvl0, lvl)


def test_tile_height_fn_matches_height_fn():
    """The windowed 3-tap-min (one tile gather, round 3) must reproduce
    make_height_fn bit-for-bit for every query within reach of the
    center (the per-step probe query pattern)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from humanoid_gym_tpu.config.base import TerrainCfg
    from humanoid_gym_tpu.terrain.terrain import (
        TerrainMap, make_height_fn, make_tile_height_fn,
    )

    cfg = TerrainCfg()
    cfg.num_rows, cfg.num_cols = 3, 3
    cfg.border_size = 5.0
    tmap = TerrainMap.build(cfg, np.random.default_rng(3), style="humanoid")
    ref = make_height_fn(tmap)
    tile = make_tile_height_fn(tmap)

    rng = np.random.default_rng(7)
    nrow, ncol = tmap.height_field.shape
    ext_x = nrow * tmap.horizontal_scale - tmap.border_size
    ext_y = ncol * tmap.horizontal_scale - tmap.border_size
    # centers across the grid INCLUDING beyond-border clips
    cx = jnp.asarray(rng.uniform(-tmap.border_size, ext_x, 64), jnp.float32)
    cy = jnp.asarray(rng.uniform(-tmap.border_size, ext_y, 64), jnp.float32)
    # queries within 1.2 m of each center (probe/feet reach)
    qx = cx[:, None] + jnp.asarray(rng.uniform(-1.2, 1.2, (64, 8)), jnp.float32)
    qy = cy[:, None] + jnp.asarray(rng.uniform(-1.2, 1.2, (64, 8)), jnp.float32)

    want = jax.vmap(lambda a, b: ref(a, b))(qx, qy)
    got = jax.vmap(lambda c, d, a, b: tile(c, d, a, b))(cx, cy, qx, qy)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_selected_terrain_stairs_end_to_end():
    """`selected` mode (reference terrain.py:94-107): every subterrain is
    the ONE named primitive, with terrain_kwargs applied and not mutated."""
    cfg = _small_cfg()
    cfg.curriculum = False
    cfg.selected = True
    cfg.terrain_kwargs = {
        "type": "pyramid_stairs_terrain",
        "step_width": 0.4,
        "step_height": 0.1,
        "platform_size": 1.0,
    }
    kwargs_before = dict(cfg.terrain_kwargs)
    tmap = TerrainMap.build(cfg, np.random.default_rng(0))
    assert cfg.terrain_kwargs == kwargs_before  # non-destructive
    l_px = int(cfg.terrain_length / cfg.horizontal_scale)
    w_px = int(cfg.terrain_width / cfg.horizontal_scale)
    border = int(cfg.border_size / cfg.horizontal_scale)
    # every subterrain is the SAME deterministic stairs patch
    first = tmap.height_field[border : border + l_px, border : border + w_px]
    for i in range(cfg.num_rows):
        for j in range(cfg.num_cols):
            x0, y0 = border + i * l_px, border + j * w_px
            np.testing.assert_array_equal(
                tmap.height_field[x0 : x0 + l_px, y0 : y0 + w_px], first
            )
    # stairs actually rise: center platform above the flat rim
    assert first[l_px // 2, w_px // 2] >= int(0.1 / cfg.vertical_scale)
    assert first[0, 0] == 0
    # the height_fn sees the same surface
    import jax.numpy as jnp

    h = make_height_fn(tmap)(
        jnp.asarray([cfg.terrain_length / 2]), jnp.asarray([cfg.terrain_width / 2])
    )
    assert float(h[0]) > 0.05


def test_selected_terrain_rejects_unknown_type():
    cfg = _small_cfg()
    cfg.selected = True
    cfg.terrain_kwargs = {"type": "nonexistent_terrain"}
    try:
        TerrainMap.build(cfg, np.random.default_rng(0))
    except ValueError as e:
        assert "nonexistent_terrain" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_froude_scale_scales_menu_heights():
    """froude_scale (config/base.py) multiplies menu HEIGHT amplitudes at
    build time — the S half of joint training must face the same RELATIVE
    footing difficulty as L (round-5 VERDICT #4). Slopes stay."""
    s = 1.2 / 1.65
    base = _small_cfg()
    base.style = "rubble"
    base.curriculum = True
    tm_l = TerrainMap.build(base, np.random.default_rng(0))
    scaled = _small_cfg()
    scaled.style = "rubble"
    scaled.curriculum = True
    scaled.froude_scale = s
    tm_s = TerrainMap.build(scaled, np.random.default_rng(0))
    # same rng stream, same cells chosen; heights scale by ~s (int16
    # rounding of each draw)
    hl = tm_l.height_field.astype(np.float64)
    hs = tm_s.height_field.astype(np.float64)
    nz = np.abs(hl) > 8  # ignore tiny cells dominated by rounding
    assert nz.any()
    ratio = hs[nz] / hl[nz]
    assert abs(np.median(ratio) - s) < 0.05
    # default 1.0 is bit-identical to the unscaled build
    again = TerrainMap.build(base, np.random.default_rng(0))
    np.testing.assert_array_equal(again.height_field, tm_l.height_field)


def test_xbots_cfg_points_deploy_at_scaled_field():
    from humanoid_gym_tpu import XBOT_S_TERRAIN_MJCF
    from humanoid_gym_tpu.config.xbots import SCALE, XBotSCfg

    cfg = XBotSCfg()
    assert abs(cfg.terrain.froude_scale - SCALE) < 1e-9
    assert cfg.terrain.deploy_mjcf == XBOT_S_TERRAIN_MJCF


def test_joint_deploy_keeps_unscaled_s_terrain():
    """Round-5 controlled finding: the production joint recipe must NOT
    Froude-scale the S half's terrain (clean-run L standings 77/71/51
    with scaling vs 91 without; registry._apply_joint_deploy_v2), while
    the STANDALONE S task keeps morphology-consistent scaling."""
    from humanoid_gym_tpu import registry
    from humanoid_gym_tpu.config.xbots import SCALE, XBotSCfg

    spec = registry.get_task("humanoid_joint_deploy")
    cfg = spec.make_env_cfg()
    assert cfg.terrain.froude_scale == 1.0
    assert cfg.terrain.deploy_mjcf is None
    assert abs(XBotSCfg().terrain.froude_scale - SCALE) < 1e-9


import pytest


@pytest.mark.slow
def test_joint_deploy_s_subenv_unscaled_end_to_end():
    from humanoid_gym_tpu import registry

    env, _ = registry.make_env(
        "humanoid_joint_deploy", num_envs=8,
        cfg_overrides=lambda c: setattr(c.sim.solver, "solver_type", "apgd"),
    )
    assert env.envs[1].cfg.terrain.froude_scale == 1.0
    assert env.envs[1].cfg.terrain.deploy_mjcf is None
