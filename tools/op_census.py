#!/usr/bin/env python
"""Op census of the DDA step body: what the stepping roofline is made of.

Rebuilds the pallas kernel's exact Env (arrays standing in for VMEM
refs, same closures as tracer_pallas._kernel), traces ONE while-loop
body (run_segment's chunked body: step_chunk x (segment_body +
compute_flags) + the carry pack/unpack at the chunk boundary) to a
jaxpr, and counts (64,128)-plane ops - the unit the VPU issue-bound
roofline is priced in (docs/PERFORMANCE.md round-3 roofline: ~1
vreg-instruction/cycle, a (64,128) op = 8 vregs).

Regions:
  body   - unconditional per-step ops
  fire   - inside the merged rare-event cond's taken branch (runs on
           ~37% of live tile-steps, tools/firerate.py)
  skip   - the not-taken branch (identity re-yields)
  yield  - the cond's materialized outputs (paid EVERY step: Mosaic
           materializes yielded lanes whether the branch fired or not)
  chunk  - carry pack/unpack at the chunk boundary (amortized /chunk)

effective ops/step = body + yield + fire_rate*fire + chunk/step_chunk

Usage: python tools/op_census.py [--nospheres] [--noskip] [--chunk N]
           [--fire-rate R] [--json OUT] [--top N]
CPU-friendly (traces, never executes). Not a driver contract.
"""

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build(nospheres: bool, noskip: bool, chunk: int):
    import jax
    import jax.numpy as jnp

    from pwnfps_tpu.core.approx import SseTables
    from pwnfps_tpu.core.config import RenderConfig
    from pwnfps_tpu.ops import tracer_pallas as TP
    from pwnfps_tpu.ops import worlddev as W
    from pwnfps_tpu.ops.tracer_core import (
        Env, _apply_aux, _pack_carry, _unpack_carry, cell_index,
        compute_flags, decode_portal_word, init_segment,
        make_sphere_all, make_sphere_rel, make_sphere_view,
        segment_body)
    from pwnfps_tpu.ops.vec import V3
    from pwnfps_tpu.world.levelc import load_level
    from pwnfps_tpu.world.objects import ObjectPool

    lv = load_level("/root/reference/level.txt")
    opos = [(0.0, 0.0, 0.0, 0.3), (0.0, 0.3, 0.0, 0.1),
            (0.3, 0.0, 0.0, 0.1), (0.0, 0.0, 0.3, 0.1),
            (-0.3, 0.0, 0.0, 0.1), (0.0, 0.0, -0.3, 0.1)] + [
        (dx, 0.0, dz, 0.03)
        for (dx, dz) in ((0.3, 0.1), (0.1, 0.3), (-0.3, 0.1),
                         (0.1, -0.3), (0.3, -0.1), (-0.1, 0.3),
                         (-0.3, -0.1), (-0.1, -0.3))]
    pool = ObjectPool()
    for (x, y, z, r) in ([] if nospheres else opos):
        i = pool.obj_new()
        pool.obj_set_sphere(i, r, 0.4, 9.5 + x, 0.3 + y, 5.5 + z,
                            0.8, 0.7, 0.9)
    sph = pool.prepare_render()
    world, meta = W.build_world(lv, sph, SseTables.load())
    world = jax.tree.map(jnp.asarray, world)
    cfg = RenderConfig(width=1920, height=1080, parity=False,
                       backend="pallas", step_chunk=chunk,
                       space_skip=not noskip)

    has_clear = meta.has_clear and not noskip
    rows = TP._rows(False)
    pack4 = TP._pack4(cfg, has_clear)
    tabs = TP.build_tables(world, meta, rows, False, pack4,
                           lw=meta.lw)

    # --- the _kernel Env, verbatim, with jnp arrays standing in for refs
    n_spheres = meta.n_spheres
    lh = meta.lh

    def fetch(cx, cz, page, move=None):
        return TP._compact_fetch(tabs.cword, cx, cz, rows,
                                 TP._cchunks(lh, pack4, meta.lw),
                                 page, 1, pack4,
                                 move=move, span_k=cfg.span_fetch,
                                 is_ref=False, lw=meta.lw)

    if TP._use_slot(meta.pslots, pack4):
        def fetch_portal(s_):
            r = TP._chunked_gather_paged(tabs.ptab, s_.fields.pslot,
                                         meta.pslots // 128)
            return (r & 3, (r >> 2) & 3,
                    ((r >> 4) & 0x7F) - 64, ((r >> 11) & 0x7F) - 64)
    else:
        def fetch_portal(s_):
            w = TP._chunked_gather_paged(tabs.word, cell_index(s_),
                                         TP._wchunks(lh))
            return decode_portal_word(w)

    math = TP._fast_math()

    def gather_sphere(idx):
        def ch(row):
            t = jnp.broadcast_to(tabs.spht[row:row + 1, :], idx.shape)
            return jnp.take_along_axis(t, idx, axis=1)
        return (V3(ch(0), ch(1), ch(2)), ch(3), (ch(4), ch(5), ch(6)))

    if n_spheres > 0:
        def get_sphere(si):
            return (V3(tabs.sph[si, 0], tabs.sph[si, 1], tabs.sph[si, 2]),
                    tabs.sph[si, 3], tabs.sph[si, 4],
                    tuple(tabs.sph[si, 5 + c] for c in range(3)))

        def get_bound():
            return (V3(tabs.sph[TP.NSPH_MAX, 0], tabs.sph[TP.NSPH_MAX, 1],
                       tabs.sph[TP.NSPH_MAX, 2]), tabs.sph[TP.NSPH_MAX, 3])

        sphere_all = make_sphere_all(n_spheres, get_sphere, math,
                                     get_bound,
                                     gather_sphere=gather_sphere)
        sphere_view = make_sphere_view(gather_sphere, math)
        sphere_rel = make_sphere_rel(get_bound)
    else:
        sphere_all = sphere_view = sphere_rel = None
    env = Env(math=math, fetch=fetch, fetch_portal=fetch_portal,
              sphere_pass=None, randfs=TP._randfs_i32,
              sphere_all=sphere_all, sphere_view=sphere_view,
              sphere_rel=sphere_rel,
              skip_ok=has_clear, paged=False, n_pages=1)

    # --- run_segment's while body over one (64,128) tile
    sh = (64, 128)
    key = jax.random.PRNGKey(0)
    kx, kz, ky = jax.random.split(key, 3)
    ifrom = V3(jnp.full(sh, 9.5, jnp.float32),
               jnp.full(sh, 0.5, jnp.float32),
               jnp.full(sh, 5.5, jnp.float32))
    iray = V3(jax.random.uniform(kx, sh) - 0.5,
              (jax.random.uniform(ky, sh) - 0.5) * 0.2,
              jax.random.uniform(kz, sh) - 0.5)
    active = jnp.ones(sh, jnp.int32)
    s0 = init_segment(ifrom, iray, active, env, None)
    if env.sphere_all is not None:
        s0 = _apply_aux(s0, env.sphere_all(s0, s0.active != 0))
    fl0 = compute_flags(s0, env)
    pack = cfg.pack_carry

    def body(carry):
        step, fl, s = carry
        if pack:
            s = _unpack_carry(s, env.paged, False, False)
        for _ in range(chunk):
            s = segment_body(s, env, cfg, fl)
            fl = compute_flags(s, env)
        if pack:
            s = _pack_carry(s, False, False)
        return (step + chunk, fl, s)

    c0 = _pack_carry(s0, False, False) if pack else s0
    import jax as _jax
    # jnp.* wrappers are jit-cached and a cached trace keeps its FIRST
    # caller's source lines (even across call sites within one trace) -
    # disable_jit makes the wrappers inline at their real call sites so
    # --lines attribution is exact; op counts are unchanged
    _jax.clear_caches()
    with _jax.disable_jit():
        jaxpr = _jax.make_jaxpr(body)((jnp.int32(0), fl0, c0))

    # standalone pieces, to apportion the unconditional body
    pieces = {}
    cxi = s0.cx

    def _fetchp(cx, cz):
        return env.fetch(cx, cz, None).ent

    pieces["fetch"] = _jax.make_jaxpr(_fetchp)(cxi, s0.cz)
    pieces["flags"] = _jax.make_jaxpr(
        lambda s: compute_flags(s, env))(s0)
    pieces["carry-pack+unpack"] = _jax.make_jaxpr(
        lambda s: _unpack_carry(_pack_carry(s, False, False),
                                env.paged, False, False))(s0)
    return jaxpr, sh, pieces


LANE = 64 * 128


def _wide_planes(v):
    try:
        sz = 1
        for d in v.aval.shape:
            sz *= d
        return 1 if sz >= LANE else 0
    except Exception:
        return 0


def _src_line(eqn):
    """Best user-frame `file:line` for an eqn (jaxpr source_info)."""
    try:
        from jax._src import source_info_util
        fr = source_info_util.user_frame(eqn.source_info.traceback)
        if fr is None:
            return "?"
        return f"{os.path.basename(fr.file_name)}:{fr.start_line}"
    except Exception:
        return "?"


def census(jaxpr, region, acc, per_prim, per_line=None):
    """Count lane-plane outputs per eqn, by region and primitive."""
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "cond":
            # outvars are materialized every step (the yields); nested
            # conds' yields only materialize when the parent fires, so
            # tag them with the parent path
            y = sum(_wide_planes(v) for v in eqn.outvars)
            ytag = "yield" if region == "chunkbody" else region + "/yield"
            acc[ytag] += y
            per_prim[(ytag, "cond-yield")] += y
            brs = eqn.params["branches"]
            base = "" if region == "chunkbody" else region + "/"
            # branch order: index 0 = false (skip), 1 = true (fire)
            census(brs[0].jaxpr, base + "skip", acc, per_prim, per_line)
            census(brs[1].jaxpr, base + "fire", acc, per_prim, per_line)
            continue
        if prim == "while":
            census(eqn.params["body_jaxpr"].jaxpr, region, acc, per_prim,
                   per_line)
            continue
        sub = None
        for k in ("jaxpr", "call_jaxpr"):
            if k in eqn.params:
                sub = eqn.params[k]
                break
        if sub is not None:
            census(getattr(sub, "jaxpr", sub), region, acc, per_prim,
                   per_line)
            continue
        w = sum(_wide_planes(v) for v in eqn.outvars)
        if w:
            acc[region] += w
            # dtype tag: the r5 probe ladder measured op-class prices
            # differing ~14x by dtype (i1 mask logic vs f32 fma), so
            # the census attributes planes per (prim, dtype)
            try:
                dt = str(eqn.outvars[0].aval.dtype)
                dt = {"float32": "f32", "int32": "i32", "bool": "i1",
                      "uint32": "u32"}.get(dt, dt)
            except Exception:
                dt = "?"
            per_prim[(region, f"{prim}[{dt}]")] += w
            if per_line is not None:
                per_line[(region, _src_line(eqn))] += w


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nospheres", action="store_true")
    ap.add_argument("--noskip", action="store_true")
    ap.add_argument("--chunk", type=int, default=2)
    ap.add_argument("--fire-rate", type=float, default=0.366,
                    help="merged event-cond fire rate per live "
                         "tile-step (tools/firerate.py default level)")
    ap.add_argument("--top", type=int, default=18)
    ap.add_argument("--lines", type=int, default=0,
                    help="also list the top-N source lines by planes")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

    jaxpr, sh, pieces = build(args.nospheres, args.noskip, args.chunk)
    acc = defaultdict(int)
    per_prim = defaultdict(int)
    per_line = defaultdict(int) if args.lines else None
    census(jaxpr.jaxpr, "chunkbody", acc, per_prim, per_line)
    piece_tot = {}
    for name, pj in pieces.items():
        pa, pp = defaultdict(int), defaultdict(int)
        census(pj.jaxpr, "p", pa, pp)
        piece_tot[name] = sum(pa.values())

    # the chunked body contains `chunk` steps; pack/unpack once.
    # Separate them: rerun per-region totals assuming everything in
    # region 'chunkbody' splits as (pack ops counted via primitive
    # names seen outside segment_body is impractical at jaxpr level) -
    # instead report per-chunk totals and divide.
    chunk = args.chunk
    body_pc = acc["chunkbody"] / chunk
    yield_pc = acc["yield"] / chunk
    fire_pc = acc["fire"] / chunk
    skip_pc = acc["skip"] / chunk
    eff = body_pc + yield_pc + args.fire_rate * fire_pc
    print(f"# tile {sh}, step_chunk={chunk}, "
          f"nospheres={args.nospheres}, noskip={args.noskip}")
    print(f"unconditional wide ops/step (incl. amortized chunk pack): "
          f"{body_pc:.1f}")
    print(f"cond yields/step: {yield_pc:.1f}")
    print(f"fire-branch ops/step: {fire_pc:.1f} "
          f"(x{args.fire_rate} fire rate = {args.fire_rate*fire_pc:.1f}; "
          f"NESTED cond bodies listed separately below fire at their "
          f"own rates)")
    print(f"skip-branch ops/step: {skip_pc:.1f}")
    print("region totals/step: " + ", ".join(
        f"{k}={v/chunk:.1f}" for k, v in sorted(acc.items())))
    print("pieces (planes per CALL; fetch+flags run once/step, "
          "carry pack+unpack once/chunk): " + ", ".join(
              f"{k}={v}" for k, v in piece_tot.items()))
    print(f"EFFECTIVE wide ops/step (flat fire-rate model): {eff:.1f}")
    print()
    rows = sorted(per_prim.items(), key=lambda kv: -kv[1])
    print(f"{'region':10s} {'primitive':28s} planes  /step")
    for (region, prim), n in rows[:args.top]:
        print(f"{region:10s} {prim:28s} {n:6d}  {n/chunk:6.1f}")
    if per_line is not None:
        print()
        lrows = sorted(per_line.items(), key=lambda kv: -kv[1])
        print(f"{'region':10s} {'source line':34s} planes  /step")
        for (region, line), n in lrows[:args.lines]:
            print(f"{region:10s} {line:34s} {n:6d}  {n/chunk:6.1f}")
    if args.json:
        out = {
            "tile": list(sh), "chunk": chunk,
            "nospheres": args.nospheres, "noskip": args.noskip,
            "body_per_step": body_pc, "yield_per_step": yield_pc,
            "fire_per_step": fire_pc, "skip_per_step": skip_pc,
            "fire_rate": args.fire_rate, "effective_per_step": eff,
            "per_prim": {f"{r}/{p}": n for (r, p), n in rows},
        }
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
