"""luamini: Lua 5.1 subset interpreter."""

import os

import numpy as np
import pytest

from pwnfps_tpu.script.api import EngineAPI, PythonScript, ScriptError
from pwnfps_tpu.script.luamini import Interp, LuaError, LuaScript, LuaTable
from pwnfps_tpu.world.levelc import load_level
from pwnfps_tpu.world.objects import ObjectPool

REF_GAME = "/root/reference/game.lua"
ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


def run(src, bindings=None):
    it = Interp(bindings)
    it.run(src)
    return it


def test_basics():
    it = run("""
        x = 1 + 2*3 - 4/2
        s = "a" .. "b" .. 1
        t = {10, 20, x = 5, [7] = 8}
        n = #t
        neg = -x ^ 2
        b = (1 < 2) and (2 ~= 3) and not false
    """)
    assert it.g["x"] == 5.0
    assert it.g["s"] == "ab1"
    assert it.g["t"].get(2.0) == 20.0 and it.g["t"].get("x") == 5.0
    assert it.g["n"] == 2.0
    assert it.g["neg"] == -25.0       # ^ binds tighter than unary -
    assert it.g["b"] is True


def test_control_flow():
    it = run("""
        acc = 0
        for i = 1, 10 do acc = acc + i end
        j = 0
        while j < 5 do j = j + 1 end
        k = 0
        repeat k = k + 2 until k >= 7
        if acc == 55 then r = "yes" elseif acc > 0 then r = "pos"
        else r = "no" end
        brk = 0
        for i = 1, 100 do brk = i if i == 3 then break end end
    """)
    assert it.g["acc"] == 55.0
    assert it.g["j"] == 5.0 and it.g["k"] == 8.0
    assert it.g["r"] == "yes"
    assert it.g["brk"] == 3.0


def test_functions_closures_multret():
    it = run("""
        function add(a, b) return a + b end
        local function mk(n)
            return function(x) return x + n end
        end
        inc = mk(10)
        function two() return 1, 2 end
        a, b = two()
        c = (two())
        t = {two()}
        m = math.max(3, 9, 4)
        fl = math.floor(2.9)
        fm = math.fmod(7.5, 0.5)
    """)
    assert it.g["add"] is not None
    assert it.call(it.g["add"], 2.0, 3.0) == 5.0
    assert it.call(it.g["inc"], 5.0) == 15.0
    assert it.g["a"] == 1.0 and it.g["b"] == 2.0
    assert it.g["c"] == 1.0                  # parens truncate multret
    assert it.g["t"].length() == 2.0
    assert it.g["m"] == 9.0 and it.g["fl"] == 2.0 and it.g["fm"] == 0.0


def test_stdlib_and_strings():
    it = run("""
        s = string.format("%d/%s/%.2f", 7, "x", 1.5)
        sub = string.sub("hello", 2, 4)
        t = {}
        table.insert(t, "a")
        table.insert(t, "b")
        table.insert(t, 1, "z")
        first = table.remove(t, 1)
        joined = table.concat(t, "-")
        n = tonumber("42") + tonumber("0x10", 16)
        ty = type({}) .. type("") .. type(1) .. type(nil)
        ok, err = pcall(function() error("boom") end)
    """)
    assert it.g["s"] == "7/x/1.50"
    assert it.g["sub"] == "ell"
    assert it.g["first"] == "z"
    assert it.g["joined"] == "a-b"
    assert it.g["n"] == 58.0
    assert it.g["ty"] == "tablestringnumbernil"
    assert it.g["ok"] is False and "boom" in it.g["err"]


def test_pairs_ipairs():
    it = run("""
        t = {4, 5, 6}
        sum = 0
        for i, v in ipairs(t) do sum = sum + i * v end
        cnt = 0
        for k, v in pairs({a=1, b=2}) do cnt = cnt + v end
    """)
    assert it.g["sum"] == 1 * 4 + 2 * 5 + 3 * 6
    assert it.g["cnt"] == 3.0


def test_python_bindings_roundtrip():
    calls = []
    it = run("r = hello(1, 'x') + 1", {"hello": lambda a, b:
                                       calls.append((a, b)) or 41.0})
    assert it.g["r"] == 42.0 and calls == [(1.0, "x")]


def test_errors():
    with pytest.raises(LuaError):
        run("x = nil + 1")
    with pytest.raises(LuaError):
        run("local t = nil t.x = 1")
    with pytest.raises(LuaError):
        run("f()")


@pytest.mark.skipif(not os.path.exists(REF_GAME),
                    reason="reference game.lua unavailable")
def test_reference_game_lua_verbatim():
    """The unmodified reference game.lua must run and match the Python
    twin's creature behaviour exactly."""
    lv = load_level("/root/reference/level.txt")
    pool_l = ObjectPool()
    lua = LuaScript(EngineAPI(lv, pool_l), REF_GAME)
    assert pool_l.objs_num == 14
    pool_p = ObjectPool()
    py = PythonScript(EngineAPI(lv, pool_p),
                      os.path.join(ASSETS, "scripts", "game.py"))
    sec = 0.0
    for _ in range(900):
        sec += 1 / 60
        lua.on_tick(sec, 1 / 60)
        py.on_tick(sec, 1 / 60)
    assert np.abs(pool_l.pos[:14] - pool_p.pos[:14]).max() < 1e-6
    np.testing.assert_allclose(pool_l.col[:14], pool_p.col[:14])


def test_lua_script_missing_on_tick(tmp_path):
    lv = load_level(os.path.join(ASSETS, "levels", "demo.txt"))
    bad = tmp_path / "bad.lua"
    bad.write_text("x = 1\n")
    with pytest.raises(ScriptError):
        LuaScript(EngineAPI(lv, ObjectPool()), str(bad))


def test_metatables_index_chain():
    """__index table chains + method sugar: the standard 5.1 OOP
    pattern (script.h:75-77 opens the full stdlib; luamini covers the
    core metamethods)."""
    it = run("""
        Animal = {}
        Animal.__index = Animal
        function Animal.new(name, sound)
            local a = setmetatable({}, Animal)
            a.name = name; a.sound = sound
            return a
        end
        function Animal:speak()
            return self.name .. " says " .. self.sound
        end
        Dog = setmetatable({}, {__index = Animal})
        Dog.__index = Dog
        function Dog.new(name)
            local d = Animal.new(name, "woof")
            return setmetatable(d, Dog)
        end
        function Dog:fetch() return self.name .. " fetches" end
        d = Dog.new("rex")
        r1 = d:speak()       -- inherited through two __index hops
        r2 = d:fetch()
        r3 = getmetatable(d) == Dog
    """)
    assert it.g["r1"] == "rex says woof"
    assert it.g["r2"] == "rex fetches"
    assert it.g["r3"] is True


def test_metatables_newindex_and_call():
    it = run("""
        log = {}
        proxy = setmetatable({}, {
            __newindex = function(t, k, v)
                table.insert(log, k)
                rawset(t, k, v * 2)
            end,
            __call = function(self, x) return x + 1 end,
        })
        proxy.a = 10
        got = rawget(proxy, "a")
        called = proxy(41)
        n = #log
    """)
    assert it.g["got"] == 20.0
    assert it.g["called"] == 42.0
    assert it.g["n"] == 1.0


def test_metatables_operators():
    it = run("""
        V = {}
        V.__index = V
        V.__add = function(a, b) return V.new(a.x + b.x) end
        V.__eq = function(a, b) return a.x == b.x end
        V.__lt = function(a, b) return a.x < b.x end
        V.__le = function(a, b) return a.x <= b.x end
        V.__unm = function(a) return V.new(-a.x) end
        V.__concat = function(a, b) return "v" .. a.x .. b.x end
        V.__tostring = function(a) return "V(" .. a.x .. ")" end
        function V.new(x) return setmetatable({x = x}, V) end
        a, b = V.new(1), V.new(2)
        s = (a + b).x
        eq = (a == V.new(1))
        lt = (a < b)
        ge = (b >= a)
        neg = (-a).x
        cat = a .. b
        str = tostring(a)
    """)
    g = it.g
    assert g["s"] == 3.0 and g["eq"] is True and g["lt"] is True
    assert g["ge"] is True and g["neg"] == -1.0
    assert g["cat"] == "v12"
    assert g["str"] == "V(1)"


def test_string_methods_and_select():
    it = run("""
        s = ("hello"):upper()
        n = ("abc"):len()
        f = ("%d-%s"):format(3, "x")
        cnt = select("#", 1, 2, 3)
        second, third = select(2, "a", "b", "c")
    """)
    assert it.g["s"] == "HELLO"
    assert it.g["n"] == 3.0
    assert it.g["f"] == "3-x"
    assert it.g["cnt"] == 3.0
    assert it.g["second"] == "b" and it.g["third"] == "c"


def test_protected_metatable():
    it = Interp()
    it.run("""
        t = setmetatable({}, {__metatable = "locked"})
        g = getmetatable(t)
        ok = pcall(setmetatable, t, {})
    """)
    assert it.g["g"] == "locked"
    assert it.g["ok"] is False


def test_cyclic_metatable_chain_errors():
    """5.1 errors after 100 __index/__newindex hops ('loop in
    gettable'); a cyclic chain must not hang the host (r4 advisor)."""
    it = run("""
        a, b = {}, {}
        setmetatable(a, {__index = b})
        setmetatable(b, {__index = a})
        okr, errr = pcall(function() return a.missing end)
        setmetatable(a, {__newindex = b})
        setmetatable(b, {__newindex = a})
        okw, errw = pcall(function() a.missing = 1 end)
    """)
    assert it.g["okr"] is False and "loop in gettable" in it.g["errr"]
    assert it.g["okw"] is False and "loop in settable" in it.g["errw"]


def test_eq_requires_same_handler():
    """5.1 dispatches __eq only when both operands share the handler
    (luaV_equalval); a left-only handler must NOT fire (r4 advisor)."""
    it = run("""
        mk = function(h) return setmetatable({}, h) end
        always = function(x, y) return true end
        h1 = {__eq = always}
        h2 = {__eq = function(x, y) return true end}
        same = (mk(h1) == mk(h1))          -- shared handler: fires
        diff = (mk(h1) == mk(h2))          -- different handlers: raw eq
        bare = (mk(h1) == {})              -- right has no mt: raw eq
    """)
    assert it.g["same"] is True
    assert it.g["diff"] is False
    assert it.g["bare"] is False


# ---- round-5 stdlib widening: patterns, gsub, coroutines, load ----

def test_string_find_match():
    it = run("""
        s = "hello world 42!"
        a, b = string.find(s, "world")
        c = string.match(s, "%d+")
        d, e = string.match(s, "(%a+) (%a+)")
        p1, p2, cap = string.find(s, "(o w)")
        plain = string.find("a.b", ".", 1, true)
        anch = string.find(s, "^hello")
        noanch = string.find(s, "^world")
        last = string.match(s, "(%d+)!$")
        init = string.find(s, "o", 6)
        neg = string.find(s, "o", -8)
    """)
    assert (it.g["a"], it.g["b"]) == (7.0, 11.0)
    assert it.g["c"] == "42"
    assert (it.g["d"], it.g["e"]) == ("hello", "world")
    assert (it.g["p1"], it.g["p2"], it.g["cap"]) == (5.0, 7.0, "o w")
    assert it.g["plain"] == 2.0          # plain: "." literal
    assert it.g["anch"] == 1.0
    assert it.g["noanch"] is None
    assert it.g["last"] == "42"
    assert it.g["init"] == 8.0
    assert it.g["neg"] == 8.0


def test_string_pattern_classes():
    it = run("""
        r = {}
        r.set = string.match("abc123", "[%l]+")
        r.nset = string.match("abc123", "[^%l]+")
        r.range = string.match("XYZdef", "[a-f]+")
        r.lazy = string.match("<a><b>", "<(.-)>")
        r.greedy = string.match("<a><b>", "<(.*)>")
        r.opt = string.match("color colour", "colou?r")
        r.bal = string.match("f(a(b)c)d", "%b()")
        r.backref = string.match("abcabc", "(abc)%1")
        r.pos = string.match("xy", "x()y")
        r.front = string.find("THE (quick) fox", "%f[%a]%a+")
        r.esc = string.match("3.14", "%d%.%d+")
    """)
    r = it.g["r"]
    assert r.get("set") == "abc"
    assert r.get("nset") == "123"
    assert r.get("range") == "def"
    assert r.get("lazy") == "a"
    assert r.get("greedy") == "a><b"
    assert r.get("opt") == "color"
    assert r.get("bal") == "(a(b)c)"
    assert r.get("backref") == "abc"     # match returns the capture
    assert r.get("pos") == 2.0           # position capture
    assert r.get("front") == 1.0
    assert r.get("esc") == "3.14"


def test_string_gmatch():
    it = run("""
        words = {}
        for w in string.gmatch("one two three", "%a+") do
            table.insert(words, w)
        end
        kv = {}
        for k, v in string.gmatch("a=1, b=2", "(%w+)=(%w+)") do
            kv[k] = v
        end
        n = 0
        for _ in ("x,y,,z"):gmatch("[^,]*") do n = n + 1 end
    """)
    w = it.g["words"]
    assert [w.get(float(i)) for i in (1, 2, 3)] == ["one", "two",
                                                    "three"]
    assert it.g["kv"].get("a") == "1" and it.g["kv"].get("b") == "2"
    assert it.g["n"] >= 4.0              # empty matches advance


def test_string_gsub():
    it = run("""
        a, na = string.gsub("hello world", "o", "0")
        b, nb = string.gsub("hello world", "o", "0", 1)
        c = string.gsub("hello", "(l+)", "[%1]")
        d = string.gsub("abc", "%a", "%0%0")
        e = string.gsub("a-b-c", "-", "%%")
        f = string.gsub("key=val", "(%w+)=(%w+)", "%2=%1")
        tab = {name = "lua"}
        g = string.gsub("$name", "%$(%w+)", tab)
        h = string.gsub("1 2 3", "%d", function(d) return d * 2 end)
        i = string.gsub("keep", "x", "y")
        j = string.gsub("abc", "", "-")
    """)
    assert (it.g["a"], it.g["na"]) == ("hell0 w0rld", 2.0)
    assert (it.g["b"], it.g["nb"]) == ("hell0 world", 1.0)
    assert it.g["c"] == "he[ll]o"
    assert it.g["d"] == "aabbcc"
    assert it.g["e"] == "a%b%c"
    assert it.g["f"] == "val=key"
    assert it.g["g"] == "lua"
    assert it.g["h"] == "2 4 6"
    assert it.g["i"] == "keep"
    assert it.g["j"] == "-a-b-c-"        # empty pattern between chars


def test_coroutines():
    it = run("""
        co = coroutine.create(function(a, b)
            local c = coroutine.yield(a + b)
            local d, e = coroutine.yield(c * 2)
            return d + e, "done"
        end)
        ok1, v1 = coroutine.resume(co, 3, 4)
        st_mid = coroutine.status(co)
        ok2, v2 = coroutine.resume(co, 10)
        ok3, v3, v4 = coroutine.resume(co, 5, 6)
        st_end = coroutine.status(co)
        ok4, err = coroutine.resume(co)
        ty = type(co)
    """)
    assert (it.g["ok1"], it.g["v1"]) == (True, 7.0)
    assert it.g["st_mid"] == "suspended"
    assert (it.g["ok2"], it.g["v2"]) == (True, 20.0)
    assert (it.g["ok3"], it.g["v3"], it.g["v4"]) == (True, 11.0,
                                                     "done")
    assert it.g["st_end"] == "dead"
    assert it.g["ok4"] is False
    assert "dead" in it.g["err"]
    assert it.g["ty"] == "thread"


def test_coroutine_wrap_and_errors():
    it = run("""
        gen = coroutine.wrap(function()
            for i = 1, 3 do coroutine.yield(i) end
        end)
        s = gen() + gen() + gen()
        bad = coroutine.create(function() error("boom") end)
        ok, msg = coroutine.resume(bad)
        ok2, msg2 = pcall(function() coroutine.yield(1) end)
    """)
    assert it.g["s"] == 6.0
    assert it.g["ok"] is False and "boom" in it.g["msg"]
    # yield outside a coroutine errors (5.1 semantics)
    assert it.g["ok2"] is False


def test_coroutine_nested():
    it = run("""
        inner = coroutine.create(function()
            coroutine.yield("i1")
            return "i2"
        end)
        outer = coroutine.create(function()
            local _, v = coroutine.resume(inner)
            coroutine.yield("o:" .. v)
            local _, w = coroutine.resume(inner)
            return "o:" .. w
        end)
        _, a = coroutine.resume(outer)
        _, b = coroutine.resume(outer)
    """)
    assert it.g["a"] == "o:i1"
    assert it.g["b"] == "o:i2"


def test_loadstring_os_io():
    it = run("""
        f = loadstring("return 1 + 2")
        v = f()
        bad, err = loadstring("return +")
        t = os.time()
        c = os.clock()
    """)
    assert it.g["v"] == 3.0
    assert it.g["bad"] is None and it.g["err"]
    assert it.g["t"] > 0
    assert it.g["c"] >= 0


def test_table_sort_and_getn():
    it = run("""
        t = {5, 2, 9, 1}
        table.sort(t)
        asc = table.concat(t, ",")
        table.sort(t, function(a, b) return a > b end)
        desc = table.concat(t, ",")
        s = {"pear", "apple", "fig"}
        table.sort(s)
        words = table.concat(s, " ")
        n = table.getn(t)
        -- element __lt drives the default order
        V = {__lt = function(a, b) return a.x < b.x end}
        m = {setmetatable({x = 3}, V), setmetatable({x = 1}, V),
             setmetatable({x = 2}, V)}
        table.sort(m)
        mx = m[1].x .. m[2].x .. m[3].x
        -- mixed types raise like 5.1
        ok = pcall(table.sort, {1, "a"})
    """)
    assert it.g["asc"] == "1,2,5,9"
    assert it.g["desc"] == "9,5,2,1"
    assert it.g["words"] == "apple fig pear"
    assert it.g["n"] == 4.0
    assert it.g["mx"] == "123"
    assert it.g["ok"] is False


def test_table_foreach():
    it = run("""
        acc = 0
        table.foreachi({3, 4, 5}, function(i, v) acc = acc + i * v end)
        -- non-nil return stops the walk and propagates
        hit = table.foreachi({7, 8, 9}, function(i, v)
            if v == 8 then return i end
        end)
        keys = 0
        table.foreach({a = 1, b = 2, c = 3},
                      function(k, v) keys = keys + v end)
    """)
    assert it.g["acc"] == 1 * 3 + 2 * 4 + 3 * 5
    assert it.g["hit"] == 2.0
    assert it.g["keys"] == 6.0
