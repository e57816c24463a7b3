import os

import numpy as np
import pytest

from pwnfps_tpu.core.config import FXP, FZP
from pwnfps_tpu.world import cells as C
from pwnfps_tpu.world.levelc import compile_level, load_level

REF_LEVEL = "/root/reference/level.txt"
DEMO_LEVEL = os.path.join(
    os.path.dirname(__file__), "..", "assets", "levels", "demo.txt")


def test_padding_and_spawn():
    lv = compile_level(b";;\n;*;\n")
    assert lv.spawn == (1, 1)
    assert lv.grid[1, 1] == ord(";")       # '*' rewritten to ';'
    assert lv.grid[0, 2] == ord(".")       # short row padded
    assert lv.grid[2, 0] == ord(".")       # missing rows padded


def test_empty_lines_skipped_not_blank_rows():
    # level.h:124-134: '\n' at x==0 is consumed without advancing the row
    lv = compile_level(b";;\n\n\n;;\n")
    assert lv.grid[1, 0] == ord(";")


def test_simple_portal_pair_rot():
    txt = (b"........\n"
           b".;;A.A;;\n"
           b".;;;.;;;\n")
    lv = compile_level(txt)
    pm = lv.pmap[0]
    assert (pm.x1, pm.z1, pm.x2, pm.z2) == (3, 1, 5, 1)
    # e1 free dir: +X is '.', +Z is ';' -> FZP(1); e2: +X is ';' -> FXP(0)
    assert pm.rot12 == (FXP - FZP + 2) & 3 == 1
    assert pm.c1 == ord(";") and pm.c2 == ord(";")


def test_lowercase_alias():
    # 'm' registers under the M slot AND rewrites to 'N' which registers
    # under the N slot (level.h:144-178)
    txt = (b"....\n"
           b".M;.\n"
           b".m;.\n")
    lv = compile_level(txt)
    assert lv.grid[2, 1] == ord("N")
    m = lv.pmap[ord("M") - ord("A")]
    n = lv.pmap[ord("N") - ord("A")]
    assert (m.x1, m.z1, m.x2, m.z2) == (1, 1, 1, 2)
    assert (n.x1, n.z1) == (1, 2) and n.x2 == -1 and not n.open


def test_channels_portal_kinds():
    txt = (b".......\n"
           b".A;.;A.\n"
           b".A;.;Z.\n")  # third 'A' -> wrong endpoint; 'Z' half-open
    lv = compile_level(txt)
    ch = lv.channels()
    assert ch["pkind"][1, 1] == 1 and ch["pkind"][1, 5] == 1
    assert ch["pkind"][2, 1] == 3            # wrong endpoint -> magenta
    assert ch["pkind"][2, 5] == 2            # incomplete -> wall
    assert ch["cls"][1, 1] == C.CLS_PORTAL
    # translation endpoint1 -> endpoint2
    assert ch["pdcx"][1, 1] == 4 and ch["pdcx"][1, 5] == -4


def test_channels_ramp_coefs():
    lv = compile_level(b";;;;\n;><;\n;,^;\n;;;;\n")
    ch = lv.channels()
    assert ch["rcx"][1, 1] == np.float32(-0.5)   # '>'
    assert ch["rcx"][1, 2] == np.float32(+0.5)   # '<'
    assert ch["rcz"][2, 1] == np.float32(-0.5)   # ','
    assert ch["rcz"][2, 2] == np.float32(+0.5)   # '^'
    assert ch["cls"][1, 1] == C.CLS_RAMP


def test_xcls_behind_cell_substitution():
    # portal endpoint cells substitute the *other* side's behind-cell in
    # the 2-high wall check (trace.h:404-413)
    txt = (b"........\n"
           b".A#.\x22A.\n"   # \x22 is '"'
           b"........\n")
    lv = compile_level(txt)
    ch = lv.channels()
    # e1 at (1,1): behind-cell of e2 is '"' (LOWER)
    assert ch["xcls"][1, 1] == C.CLS_LOWER
    # e2 at (5,1): behind-cell of e1 is '#' (TALL)
    assert ch["xcls"][1, 5] == C.CLS_TALL


def test_is_solid_semantics():
    lv = compile_level(b";;;\n;#;\n")
    assert lv.is_solid(ord("#"), ord(";"), -0.1)
    assert not lv.is_solid(ord("#"), ord(";"), 1.5)
    assert lv.is_solid(ord("#"), ord(";"), 2.0)
    # '"' after '#': shifted window [1,2)
    assert lv.is_solid(ord('"'), ord("#"), 0.5)
    assert not lv.is_solid(ord('"'), ord("#"), 1.5)
    assert not lv.is_solid(ord('"'), ord(";"), 0.5)
    assert lv.is_solid(ord("X"), ord(";"), 0.5)    # closed portal = solid
    assert lv.is_solid(ord("."), ord(";"), 0.5)
    # OOB get_cell clamps to (0,0)
    assert lv.get_cell(-5, 70) == lv.get_cell(0, 0)


def test_demo_level_compiles():
    lv = load_level(DEMO_LEVEL)
    assert lv.spawn == (3, 3)
    for letter in "ABC":
        assert lv.pmap[ord(letter) - ord("A")].open
    d = lv.pmap[ord("D") - ord("A")]
    assert d.open            # paired via lowercase 'd'
    e = lv.pmap[ord("E") - ord("A")]
    assert not e.open        # the aliased half of 'd'
    lv.channels()            # compiles without error


@pytest.mark.skipif(not os.path.exists(REF_LEVEL),
                    reason="reference level unavailable")
def test_reference_level():
    lv = load_level(REF_LEVEL)
    assert lv.spawn == (9, 4)
    # lowercase 'm' at (4,4): M pairs (4,3)-(4,4); N stays half-open
    m = lv.pmap[ord("M") - ord("A")]
    n = lv.pmap[ord("N") - ord("A")]
    assert (m.x1, m.z1, m.x2, m.z2) == (4, 3, 4, 4)
    assert (n.x1, n.z1) == (4, 4) and not n.open
    assert lv.grid[4, 4] == ord("N")
    # lowercase 'x' at (13,24): X pairs (13,24)-(13,25); Y pairs with it
    X = lv.pmap[ord("X") - ord("A")]
    Y = lv.pmap[ord("Y") - ord("A")]
    assert (X.x1, X.z1, X.x2, X.z2) == (13, 24, 13, 25)
    assert (Y.x1, Y.z1, Y.x2, Y.z2) == (3, 12, 13, 24)
    assert lv.grid[24, 13] == ord("Y")
    lv.channels()


@pytest.mark.skipif(not os.path.exists(REF_LEVEL),
                    reason="reference level unavailable")
def test_reference_level_extent_trim():
    """The level-extent trim must engage: content in level.txt ends by
    row 28, so meta.lh comes out 32 (not the safe-but-inert 64), halving
    the pallas cell-table gather chunks and VMEM."""
    from pwnfps_tpu.core.approx import SseTables
    from pwnfps_tpu.ops import worlddev as W
    from pwnfps_tpu.world.objects import ObjectPool

    lv = load_level(REF_LEVEL)
    _, meta = W.build_world(lv, ObjectPool().prepare_render(),
                            SseTables.load())
    assert meta.lh == 32
