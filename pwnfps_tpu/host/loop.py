"""Game loop: the host runtime driving the device renderer.

Mirrors the reference main loop (/root/reference/main.c:42-381):
  prepare objects -> render (one jitted device call) -> present ->
  fps accounting -> script on_tick -> input -> player physics/portals.

This environment has no display server or SDL, so presentation is
headless: frames are optionally written as PNGs (with nearest-neighbour
integer upscale, screen.h:126-149) or streamed to a callback.  Input
comes from a scripted key timeline for deterministic runs.

Usage:
    python -m pwnfps_tpu.host.loop --frames 8 --out /tmp/frames \
        [--level PATH] [--script PATH] [--width 320 --height 200]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..core.approx import SseTables
from ..core.config import DEF_RHEIGHT, DEF_RWIDTH, DEF_SCALE, RenderConfig
from ..ops import worlddev as W
from ..render.camera import camera_vectors
from ..render.frame import fb_to_rgb, render_frame, upscale
from ..script.api import EngineAPI, PythonScript
from ..world.levelc import LevelData, load_level
from ..world.objects import ObjectPool
from .physics import Keys, PlayerState, step_player

_ASSETS = os.path.join(os.path.dirname(__file__), "..", "..", "assets")
DEFAULT_LEVEL = os.path.join(_ASSETS, "levels", "demo.txt")
DEFAULT_SCRIPT = os.path.join(_ASSETS, "scripts", "game.py")


def make_script(api: EngineAPI, path: str):
    if path.endswith(".lua"):
        from ..script.luamini import LuaScript
        return LuaScript(api, path)
    return PythonScript(api, path)


class GameSession:
    """The complete engine state + per-frame stepping."""

    def __init__(self, level_path: str = DEFAULT_LEVEL,
                 script_path: str = DEFAULT_SCRIPT,
                 cfg: RenderConfig | None = None,
                 creature_at: tuple[float, float, float] | None = None):
        import jax
        import jax.numpy as jnp

        self.jnp = jnp
        self.jax = jax
        self.cfg = cfg or RenderConfig()
        self.level: LevelData = load_level(level_path)
        self.pool = ObjectPool()
        self.api = EngineAPI(self.level, self.pool)
        self.script = make_script(self.api, script_path) \
            if script_path else None
        self.player = PlayerState.at_spawn(self.level)
        self.sec = np.float32(0.0)
        self.tables = SseTables.load()
        self.static_word = W.pack_static_word(self.level)
        self.fps = 0.0
        self._fcount = 0
        self._tlastfps = time.perf_counter()

    def render(self):
        """One jitted render call; returns (fb uint32 [h,w], zbuf)."""
        jnp = self.jnp
        sph = self.pool.prepare_render()
        world, meta = W.build_world(self.level, sph, self.tables,
                                    self.static_word)
        world = self.jax.tree.map(jnp.asarray, world)
        origin, rayb, rdx, rdy = camera_vectors(
            self.player.cam, self.cfg.width, self.cfg.height)
        fb, zb = render_frame(world, meta, self.cfg, jnp.asarray(origin),
                              jnp.asarray(rayb), jnp.asarray(rdx),
                              jnp.asarray(rdy), self.sec)
        return np.ascontiguousarray(np.asarray(fb)), np.asarray(zb)

    def tick(self, dt: float, keys: Keys | None = None):
        """Post-render frame logic: clock, script, physics."""
        self.sec = np.float32(self.sec + np.float32(dt))
        if self.script is not None:
            self.script.on_tick(float(self.sec), float(dt))
        step_player(self.level, self.player, dt, keys or Keys())
        self._fcount += 1
        now = time.perf_counter()
        if now - self._tlastfps >= 1.0:
            self.fps = self._fcount / (now - self._tlastfps)
            self._fcount = 0
            self._tlastfps = now


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--level", default=DEFAULT_LEVEL)
    p.add_argument("--script", default=DEFAULT_SCRIPT)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--width", type=int, default=DEF_RWIDTH)
    p.add_argument("--height", type=int, default=DEF_RHEIGHT)
    p.add_argument("--scale", type=int, default=DEF_SCALE)
    p.add_argument("--dt", type=float, default=1.0 / 60.0)
    p.add_argument("--out", default=None,
                   help="directory for PNG frames (requires pillow)")
    p.add_argument("--keys", default="",
                   help="timeline like '0:forward,30:turnleft' "
                        "(frame:key toggles)")
    p.add_argument("--window", action="store_true",
                   help="live SDL2 window + keyboard (needs libSDL2 "
                        "and a display; reference main.c:386-403)")
    p.add_argument("--parity", action="store_true")
    p.add_argument("--backend", default="jnp", choices=["jnp", "pallas"])
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax profiler trace into DIR")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu): a plugin "
                        "device whose transport is down hangs backend "
                        "init forever, and a sitecustomize that "
                        "force-registers it makes JAX_PLATFORMS inert "
                        "- jax.config set before first backend use is "
                        "the one switch that always wins")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    cfg = RenderConfig(width=args.width, height=args.height,
                       scale=args.scale, parity=args.parity,
                       backend=args.backend)
    sess = GameSession(args.level, args.script, cfg)

    profiler_ctx = None
    if args.profile:
        import jax
        try:
            profiler_ctx = jax.profiler.trace(args.profile)
            profiler_ctx.__enter__()
        except Exception as e:  # profiling unsupported on some backends
            print(f"profiler unavailable: {e}")
            profiler_ctx = None

    toggles: dict[int, list[str]] = {}
    if args.keys:
        for item in args.keys.split(","):
            fr, name = item.split(":")
            toggles.setdefault(int(fr), []).append(name)
    keys = Keys()

    win = None
    if args.window:
        from .window import Presenter
        win = Presenter(args.width, args.height, args.scale)

    if args.out:
        os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    tlast = t0
    f = 0
    while f < args.frames or (win is not None and args.frames <= 0):
        for name in toggles.get(f, []):
            setattr(keys, name, not getattr(keys, name))
        fb, zb = sess.render()
        if win is not None:
            win.present(fb)
            live, quit_ = win.poll()
            if quit_:
                break
            # live keys override the scripted timeline (main.c:142-186)
            keys = live
            now = time.perf_counter()
            frame_dt, tlast = now - tlast, now
            win.set_title(f"pwnfps-tpu | {sess.fps:.1f} fps")
        else:
            frame_dt = args.dt
        if args.out:
            from PIL import Image
            img = fb_to_rgb(upscale(fb, args.scale))
            Image.fromarray(img).save(
                os.path.join(args.out, f"frame_{f:04d}.png"))
        sess.tick(frame_dt if win is not None else args.dt, keys)
        f += 1
    dt = time.perf_counter() - t0
    if win is not None:
        win.close()
    if profiler_ctx is not None:
        profiler_ctx.__exit__(None, None, None)
        print(f"profiler trace written to {args.profile}")
    print(f"{f} frames in {dt:.2f}s "
          f"({f / max(dt, 1e-9):.2f} fps) at {args.width}x{args.height}, "
          f"player at {sess.player.cam[3, :3]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
