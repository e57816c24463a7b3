"""Host runtime: physics, script API, snapshot, game session."""

import os

import numpy as np
import pytest

from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.host.physics import Keys, PlayerState, step_player
from pwnfps_tpu.host.snapshot import load_state, save_state
from pwnfps_tpu.script.api import EngineAPI, PythonScript, ScriptError
from pwnfps_tpu.world.levelc import compile_level, load_level
from pwnfps_tpu.world.objects import ObjectPool

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")
DEMO = os.path.join(ASSETS, "levels", "demo.txt")
GAME = os.path.join(ASSETS, "scripts", "game.py")


def test_player_walk_and_pushback():
    lv = compile_level(b".....\n.;;;.\n.;*;.\n.;;;.\n.....\n")
    st = PlayerState.at_spawn(lv)
    assert np.allclose(st.cam[3, :3], (2.5, 0.5, 2.5))
    # walk forward (+z basis) into the wall: pushback pins the player at
    # cell + 0.5 + (0.5 - PLAYER_BBOX), bbox flush against the boundary
    # (main.c:240-247)
    for _ in range(120):
        step_player(lv, st, 1 / 60, Keys(forward=True))
    assert st.cam[3, 2] == np.float32(3.8)


def test_player_turn():
    lv = compile_level(b".....\n.;;;.\n.;*;.\n.;;;.\n.....\n")
    st = PlayerState.at_spawn(lv)
    for _ in range(60):  # 1 second at 3 rad/s
        step_player(lv, st, 1 / 60, Keys(turnleft=True))
    # basis stays orthonormal-ish after many f32 rotations
    z = st.cam[2, :3]
    assert abs(np.linalg.norm(z) - 1) < 1e-3


def test_player_portal_traversal():
    txt = (b"........\n"
           b".;A..A;.\n"
           b".;;..;;.\n"
           b"..*.....\n")
    lv = compile_level(txt)
    st = PlayerState.at_spawn(lv)
    # place player next to portal endpoint 1, walk into it
    st.cam[3, :3] = (1.5, 0.5, 1.5)
    # NB: the reference maps "move left" to +x basis (main.c:199-205)
    for _ in range(120):
        step_player(lv, st, 1 / 60, Keys(left=True))
        if int(st.cam[3, 0]) >= 5:
            break
    # crossing the 'A' at (2,1) teleports past the partner at (5,1)
    assert int(st.cam[3, 0]) >= 5


def test_gravity_clamp():
    lv = compile_level(b";;;\n;*;\n;;;\n")
    st = PlayerState.at_spawn(lv)
    st.cam[3, 1] = np.float32(0.9)
    for _ in range(200):
        step_player(lv, st, 1 / 60, Keys())
    assert st.cam[3, 1] == np.float32(0.4)


def test_script_api_contract():
    lv = load_level(DEMO)
    pool = ObjectPool()
    api = EngineAPI(lv, pool)
    h = api.obj_new()
    api.obj_set(h, "SPHERE", 0.3, 0.5, 3.5, 0.4, 5.5, 1.0, 0.8, 0.6)
    assert pool.typ[h] == 2
    assert api.level_get(3, 3) == ";"
    assert api.level_get(-5, 99) == api.level_get(0, 0)
    api.level_set(1, 1, "#")  # stub no-op
    api.obj_free(h)
    assert pool.typ[h] == 1
    with pytest.raises(ValueError):
        api.obj_set(h, "cube", 1, 1, 0, 0, 0, 0, 0, 0)


def test_game_script_runs():
    lv = load_level(DEMO)
    pool = ObjectPool()
    api = EngineAPI(lv, pool)
    script = PythonScript(api, GAME)
    assert pool.objs_num == 14           # creature spawned at load
    p0 = pool.pos[:14].copy()
    script.on_tick(0.3, 1 / 60)
    assert not np.allclose(pool.pos[:14], p0)   # it moved/spun
    # creature roams without leaving the grid over many ticks
    for k in range(600):
        script.on_tick(0.3 + k / 60, 1 / 60)
    assert 0 <= pool.pos[:14, 0].min() and pool.pos[:14, 0].max() < 64
    assert 0 <= pool.pos[:14, 2].min() and pool.pos[:14, 2].max() < 64


def test_script_missing_on_tick(tmp_path):
    lv = load_level(DEMO)
    api = EngineAPI(lv, ObjectPool())
    bad = tmp_path / "bad.py"
    bad.write_text("x = 1\n")
    with pytest.raises(ScriptError):
        PythonScript(api, str(bad))


def test_snapshot_roundtrip(tmp_path):
    lv = load_level(DEMO)
    pool = ObjectPool()
    api = EngineAPI(lv, pool)
    PythonScript(api, GAME)
    st = PlayerState.at_spawn(lv)
    st.gravity_y = np.float32(-0.01)
    path = str(tmp_path / "save.npz")
    save_state(path, st, pool, 3.25, {"note": "hi"})
    p2, pool2, sec, extra = load_state(path)
    np.testing.assert_array_equal(p2.cam, st.cam)
    assert p2.gravity_y == st.gravity_y
    assert sec == 3.25 and extra == {"note": "hi"}
    np.testing.assert_array_equal(pool2.pos[:14], pool.pos[:14])


def test_game_session_e2e():
    from pwnfps_tpu.host.loop import GameSession
    cfg = RenderConfig(width=64, height=32)
    sess = GameSession(cfg=cfg)
    fb, zb = sess.render()
    assert fb.shape == (32, 64) and fb.dtype == np.uint32
    assert len(np.unique(fb)) > 8       # a real image, not a flat fill
    sess.tick(1 / 60, Keys(forward=True))
    fb2, _ = sess.render()
    assert not np.array_equal(fb, fb2)  # moved camera + animated scene
