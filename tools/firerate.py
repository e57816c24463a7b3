"""Per-tile-step gate fire rates on the default level (CPU replay).

For each 64x128 tile and DDA step: does the tile have any active lane
standing on a (portal | dirty | ramp | tall | fog) cell?  This decided
the ramp-into-cond move (docs/PERFORMANCE.md round 3): ramp raises the
merged-cond union only 35.5%% -> 36.6%% of live tile-steps while its
ops leave ~63%% of steps; tall (54%%) and fog (50%%) fire too often to
gate the same way.

Usage: PYTHONPATH=/root/repo python tools/firerate.py  (CPU, ~4 min)"""
import sys, numpy as np, jax
jax.config.update('jax_platforms','cpu')
import jax.numpy as jnp
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pwnfps_tpu.world.levelc import load_level
from pwnfps_tpu.world.objects import ObjectPool
from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.core import lcg
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.tracer_jnp import make_env
from pwnfps_tpu.ops import tracer_core as TC
from pwnfps_tpu.ops.vec import V3, C4
from pwnfps_tpu.render.camera import camera_vectors, mat4_identity, mat4_roty
from pwnfps_tpu.render.frame import gen_rays
import functools

lv = load_level('/root/reference/level.txt')
pool = ObjectPool()
opos=[(0,0,0,.3,.6),(0,.3,0,.1,.2),(.3,0,0,.1,.4),(0,0,.3,.1,.4),(-.3,0,0,.1,.4),(0,0,-.3,.1,.4),
      (.3,0,.1,.03,.2),(.1,0,.3,.03,.2),(-.3,0,.1,.03,.2),(.1,0,-.3,.03,.2),(.3,0,-.1,.03,.2),
      (-.1,0,.3,.03,.2),(-.3,0,-.1,.03,.2),(-.1,0,-.3,.03,.2)]
for (x,y,z,r,rf) in opos:
    i=pool.obj_new(); pool.obj_set_sphere(i,r,rf,9.5+x,.3+y,5.5+z,.8,.8,.8)
world, meta = W.build_world(lv, pool.prepare_render(), SseTables.load())
world = jax.tree.map(jnp.asarray, world)
w,h = 896, 512
cfg = RenderConfig(width=w,height=h,parity=False)
env = make_env(world, meta, cfg)

# bounding sphere of the scene spheres (as tracer_pallas.build_tables)
_c = np.asarray(world.sph_pos)[:meta.n_spheres]
_lo, _hi = _c.min(axis=0), _c.max(axis=0)
_bc = (_lo + _hi) * 0.5
_br = float(np.sqrt(((_c - _bc[None]) ** 2).sum(axis=1)).max()
            + np.asarray(world.sph_r)[:meta.n_spheres].max())
_bc = _bc.astype(np.float32); _br = np.float32(_br)

@jax.jit
def gates(s):
    act = s.active != 0
    f = s.fields
    cls = f.cls
    dirty = act & ((s.sph_dirty & 1) != 0)
    portal = act & (cls == W.PORTAL)
    ramp = act & (cls >= W.RAMP_GT) & (cls <= W.RAMP_CR)
    tall = act & ((cls == W.TALL) | (cls == W.TALLFOG))
    fog = act & ((cls == W.FOG) | (cls == W.TALLFOG))
    # the refresh's nested bound gate (make_sphere_all.run: anyq):
    # the 900-plane run_full body only executes on tile-steps where
    # some DIRTY lane's directed 3D line hits the scene bound sphere
    brq2 = _br * _br + np.float32(0.04)
    rx = _bc[0] - s.pos.x; rz = _bc[2] - s.pos.z
    d2xz = rx * rx + rz * rz
    dtxz = rx * s.ray.x + rz * s.ray.z
    l2 = s.ray.x * s.ray.x + s.ray.z * s.ray.z
    rel = (d2xz - brq2) * l2 < dtxz * dtxz
    ry_ = _bc[1] - s.pos.y
    d2 = d2xz + ry_ * ry_
    dt3 = dtxz + ry_ * s.ray.y
    l3 = l2 + s.ray.y * s.ray.y
    quick = (rel & ((dt3 > 0) | (dt3 * dt3 < brq2 * l3))
             & ((d2 - brq2) * l3 < dt3 * dt3))
    anyq = dirty & quick
    def tile_any(m):
        m2 = m.reshape(h//64, 64, w//128, 128)
        return m2.any(axis=(1,3))
    return tuple(tile_any(m) for m in (act, dirty, portal, ramp, tall,
                                       fog, anyq))

@functools.partial(jax.jit, static_argnums=())
def step(s):
    return TC.segment_body(s, env, cfg, jnp.int32(3))

tot = np.zeros(7, np.int64)  # live,dirty,portal,ramp,tall,fog,anyq tile-steps
union_dp = 0; union_dpr = 0; union_pr = 0
for rot in (0.0, 1.1, 2.2):
    cam = mat4_identity(); sx,sz = lv.spawn; cam[3,:3]=(sx+.5,.5,sz+.5)
    mat4_roty(cam, rot)
    o, rb, rdx, rdy = camera_vectors(cam, w, h)
    rays = gen_rays(jnp.asarray(rb), jnp.asarray(rdx), jnp.asarray(rdy), w, h, False)
    n=w*h
    ifrom = V3(*(jnp.broadcast_to(jnp.float32(o[i]), (n,)) for i in range(3)))
    xs = jnp.arange(w, dtype=jnp.uint32); ys = jnp.arange(h, dtype=jnp.uint32)
    seeds = lcg.pixel_seed(xs[None,:], ys[:,None], w).reshape(-1)
    active = jnp.ones(n, bool); icol = C4(*([jnp.ones(n)]*4)); seed = seeds
    cur_from, cur_ray = ifrom, rays
    for k in range(3):
        s = TC.init_segment(cur_from, cur_ray, active, env)
        s = TC._apply_aux(s, env.sphere_all(s, s.active != 0))
        for it in range(64):
            g = [np.asarray(x) for x in gates(s)]
            if not g[0].any(): break
            tot += np.array([x.sum() for x in g])
            union_dp += (g[1]|g[2]).sum(); union_dpr += (g[1]|g[2]|g[3]).sum()
            union_pr += (g[2]|g[3]).sum()
            s = step(s)
        out = TC.seg_out_view(s, env)
        base, refl, bounce, mpos, mray, seed = TC.shade_and_bounce(out, icol, seed, jnp.float32(0.5), k < cfg.reflect, env)
        icol = base; cur_from, cur_ray = mpos, mray; active = bounce
live = tot[0]
print('live tile-steps:', live)
for name, v in zip(('dirty','portal','ramp','tall','fog','anyq'), tot[1:]):
    print('%7s fire: %5.1f%%' % (name, 100.0*v/live))
print('union dirty|portal      : %5.1f%%' % (100.0*union_dp/live))
print('union dirty|portal|ramp : %5.1f%%' % (100.0*union_dpr/live))
print('union portal|ramp       : %5.1f%%' % (100.0*union_pr/live))
