"""Engine configuration.

The reference engine (/root/reference/defs.h:1-23) hardcodes everything as
compile-time #defines.  Here the same knobs are a frozen dataclass whose
fields are passed as *static* arguments into the jitted render path, so XLA
still sees compile-time constants.
"""

from __future__ import annotations

import dataclasses

# --- constants mirrored from the reference operating point -----------------
# /root/reference/defs.h:1   EPSILON
EPSILON = 1e-13
# /root/reference/defs.h:6   REFLECT_BLUR
REFLECT_BLUR = 0.03
# /root/reference/defs.h:7   PLAYER_BBOX
PLAYER_BBOX = 0.2
# /root/reference/defs.h:8   REFLECT (max bounce depth)
REFLECT = 2
# /root/reference/defs.h:9   POSTPROC_BLUR passes
POSTPROC_BLUR = 1
# /root/reference/defs.h:11-15 default internal res + integer upscale
DEF_SCALE = 3
DEF_RWIDTH = 320
DEF_RHEIGHT = 200
# /root/reference/trace.h:247 DDA step budget per ray segment
MAXSTEPS = 1000

# Palette (b, g, r) float triples - /root/reference/defs.h:17-19.
# The reference keeps colours in SSE lanes ordered (b, g, r, a); we keep the
# same channel order end-to-end and only swap to RGB when exporting images.
COL_CEIL = (30.0, 30.0, 0.0)
COL_FLOOR = (1.0, 1.0, 1.0)
COL_WALL = (0.8, 0.8, 1.0)
# wrong-endpoint portal debug colour - /root/reference/trace.h:558
COL_MAGENTA = (5.0, 0.0, 5.0)

# Face direction codes - /root/reference/defs.h:25-33.  The X/Z face codes
# live in 0..3 so a quarter-turn portal rotation is `(ldir - rot) & 3`
# (/root/reference/trace.h:576).
FXP = 0
FZP = 1
FXN = 2
FZN = 3
FYP = 4
FYN = 5


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render parameters (hashable: usable as a jit static arg)."""

    width: int = DEF_RWIDTH
    height: int = DEF_RHEIGHT
    scale: int = DEF_SCALE
    reflect: int = REFLECT          # bounce depth cap (number of extra waves)
    maxsteps: int = MAXSTEPS        # DDA trip budget per segment
    reflect_blur: float = REFLECT_BLUR
    postproc_blur: int = POSTPROC_BLUR
    # parity=True reproduces the reference's approximate SSE intrinsics
    # (rsqrt/rcp lookup tables) and serial ray-offset accumulation for
    # pixel-exact comparison; parity=False uses the fast TPU-native math.
    parity: bool = False
    # backend: "jnp" (XLA, the reference/parity path) or "pallas"
    # (Mosaic kernel, the fast path; implies parity=False).
    backend: str = "jnp"
    # DDA steps executed per while-loop iteration (amortizes the
    # per-step scalar cond sync; the early-exit check runs once per
    # chunk, costing dead lanes at most chunk-1 masked extra steps).
    # Must divide maxsteps. 2 measures ~0.5ms/frame faster at 1080p.
    step_chunk: int = 2
    # empty-space skip (fast mode only; parity mode always steps one
    # cell like the reference): a ray's next crossing on an axis may be
    # up to run+1 cells out through a same-class run when no transverse
    # crossing intervenes (see ops/worlddev.py and segment_body).
    # Sound for every lane because sphere candidates never live in
    # cells on the fast path: they are hoisted per ray line and
    # re-derived on line-change events (tracer_core.make_sphere_all);
    # guarded by the skip-vs-no-skip differentials in
    # tests/test_space_skip.py.  Ignored when parity=True.
    space_skip: bool = True
    # ABLATION KNOB ONLY (perf_probe --nowater): water=False replaces
    # the animated water normal's 4 transcendentals in shade_and_bounce
    # with a flat +y normal to size their cost on chip.  Never ship it.
    water: bool = True
    # record the per-ray DDA step count at termination (SegOut.tstep).
    # Telemetry only; costs two vector ops per step, so off by default.
    profile: bool = False
    # page the camera stands in (multi-page world atlases; see
    # ops/worlddev.py "Paged worlds")
    cam_page: int = 0
    # pack the DDA while-carry's small-integer planes (gx/gy/gz sign
    # bits, ldir, active, sph_dirty, aux_idx, tmeta, page) into ONE
    # i32 word and cx/cz into one 2x16-bit word at chunk boundaries:
    # 32 -> 23 carried (64,128) planes (the compact-aux-record change
    # measured ~0.08 ms/plane of while-carry traffic on chip).
    # Lossless by range (ldir<=5, tmeta<=15, aux_idx<2^10 - guarded at
    # make_env, |cx|,|cz| < 64 + 16*maxsteps < 2^15, page<=16 - the
    # worlddev build bound), so bit-exact: pack/unpack is the identity
    # and segment_body itself is untouched.
    pack_carry: bool = True
    # mover-window cell fetch (pallas backend): only lanes that MOVE a
    # step (DDA-stepped | portal-go) consume the fetched word, and
    # movers are the tile's advancing front, whose packed-table chunk
    # indices span <= 2 of the 16 chunks on 87% of flagship tile-steps
    # (17.6% have no movers at all; tools/fetch_span.py).  span_fetch=K
    # scans a K-chunk window at a dynamic base behind ONE tile-uniform
    # cond instead of all lh/4 chunks.  Bit-exact: covered movers read
    # the same word either way, and non-movers never consume the result
    # (segment_body gates every f_next consumer behind stepped | pgo).
    #
    # OFF by default: measured SLOWER on chip despite cutting the
    # census's largest unconditional block (-61 planes/step, -8.6%
    # effective): 1080p depth-32 = 11.31 ms off, 12.26 ms at K=2,
    # 12.46 at K=4; the isolating span_fetch=-1 ablation (reductions +
    # cond, always-full scan) = 12.71 ms.  So the two per-step
    # cross-lane reductions + cond cost +1.40 ms (~0.7 ms/reduction)
    # while the window scan recovers only 0.45 ms - the same Mosaic
    # per-step-scalar cost that killed the lean/full split.  Kept as
    # the measured record and as the price tag on ANY
    # per-step-reduction roadmap idea; docs/PERFORMANCE.md round 4.
    span_fetch: int = 0
    # pixel-rectangle shape of one Mosaic tile (fast mode; None =
    # (tile/128, 128)).  Host-side tiling only - the kernel sees the
    # same flat 8192-lane batches; the rectangle sets which pixels
    # share a tile's uniform gates.  (8, 1024) aligns tiles to 8-row
    # bands (the mesh local-untile shape); A/B knob, default shape
    # measured best single-chip.
    tile_rect: tuple | None = None
    # 2D frame-layout trace I/O (pallas fast mode, default-(64,128)
    # rectangles): the kernel's BlockSpecs address each tile's pixel
    # rectangle of the padded [hp, wp] frame directly (index map
    # i -> (i // nbx, i % nbx)), so rays arrive and fb/zbuf leave in
    # ROW-MAJOR frame layout - no host-side block-major tile/untile
    # relayouts (7 input + 2 output XLA transposes per frame), and a
    # row-band-sharded mesh untiles locally.  Bit-equal to the flat
    # path: same pixel rectangles in the same grid order
    # (tests/test_pallas.py::test_pallas_frame_hw_bitexact).
    # Chip A/B (r4, same session, 1080p depth-32): 11.12 ms on vs
    # 11.18 off - neutral-to-slightly-better, and it deletes 9 XLA
    # relayout passes, so ON by default (tools/perf_probe.py --trace2d
    # remains the knob).
    trace_2d: bool = True
    # mesh renderers: shard frames as contiguous row BANDS traced in
    # 2D frame layout when the frame is tall enough
    # (parallel/sharding._band_rows) - each device untiles and blurs
    # its own rows, so the only per-frame collectives are the blur's
    # +-48-row halo ppermutes (vs ~5.4 frame equivalents of relayout
    # all-gathers on the flat block-major path,
    # tools/mesh_collectives.py).  False = always the flat path.
    mesh_bands: bool = True
    # fused wave loop (fast mode): terminated lanes shade and restart
    # their bounce segment inside ONE DDA loop instead of waiting for a
    # per-wave barrier - a tile executes max_lane(total steps) rather
    # than sum over waves of max_lane(wave steps).  Geometry (terminal
    # kinds, distances, zbuf) is bit-identical to the unfused loop;
    # colours agree to ~1 ULP because the unwind blend is composed
    # forward as a per-lane affine, which associates the reflectance
    # products differently (tests/test_fused.py pins both).  The two
    # backends remain bit-identical to each other.  Parity/profile
    # runs always use the unfused structure.
    #
    # OFF by default: measured SLOWER on every BASELINE scene (23.3 vs
    # 14.2 ms trace-only at 1080p; 60.5 vs ~30 ms at reflect=6) -
    # segment lifetimes are 3-4 DDA steps, so the per-death
    # shade+restart block runs nearly every step and its ~400 ops
    # outweigh the 1.24-1.6x step-occupancy win the fused bound
    # promises (tools/occupancy.py).  This is the measured dismissal
    # of inter-wave ray compaction on this workload; see
    # docs/PERFORMANCE.md.
    fused: bool = False
    # MEASUREMENT-ONLY op-class calibration pads (tools/probe_ladder.py;
    # never ship a probe config).  Each variant adds a KNOWN count of
    # extra vector ops to the step body whose results are discarded at
    # runtime behind a data-opaque select (cdist > -1e30: always true,
    # not statically provable), so rendered frames stay bit-identical
    # to probe="" (tests/test_probe.py) while the compiled kernel
    # carries the extra issue load.  Timing probe-vs-base on chip
    # prices each op CLASS in ms/plane - the calibration the census's
    # flat plane model needs (the r3/r4 A/B record shows plane classes
    # differ wildly: -100 skip planes and +9 carry planes both measured
    # ~0 ms).  Variants: "pad64" 8 independent 8-step f32 mul+add
    # chains (128 planes, issue probe); "pad64d" one 64-step dependent
    # chain (latency probe); "sel64" 8x8 f32 selects on live masks;
    # "bool128" 64 and + 64 xor on live i1 masks; "int128" the same
    # chains on i32 {0,1} masks (i1-vs-i32 logic cost); "cmp64" 64
    # f32 compare + select pairs (minus sel64 = the compares);
    # "fetch2x" a second full cell fetch at a runtime-equal index
    # (CSE-proof); "fire1" forces the merged event cond to fire every
    # step (bit-exact by the merged-cond contract; prices the fire
    # branch at rate 1.0).
    probe: str = ""
    # distribution samples per frame (config #5 path tracing): traced
    # in ONE device call with the primary wave SHARED across samples -
    # wave 0 never consumes the RNG seed, so per-sample primaries are
    # bit-identical and tracing them per sample (as the old 4-call
    # render_accumulated did) was pure waste.  Sample k's seed stream
    # is base + k * 0x9E3779B9 (Weyl), unchanged.  The accumulated
    # mean reproduces the old path's float ops in the same order, so
    # results are bit-identical on non-FMA-contracting backends.
    samples: int = 1

    @property
    def n_waves(self) -> int:
        # primary segment + up to `reflect` bounce segments
        return self.reflect + 1
