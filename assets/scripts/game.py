# Default game logic: the roaming "ball creature".
#
# Python twin of the reference's game.lua behaviour (game.lua:1-88),
# written against the engine's 5-function script API: a 14-sphere
# formation (body, blinking head, 4 orbs, 8 pebbles) that spins at one
# revolution per 2 s and roams the grid, turning right on obstacles and
# reversing when cornered, using level_get look-ahead.
import math

# (dx, dy, dz, radius, b, g, r, reflectivity)
PARTS = [
    (0.0, 0.0, 0.0, 0.3, 0.8, 0.8, 0.8, 0.6),       # body
    (0.0, 0.3, 0.0, 0.1, 0.4, 0.4, 0.4, 0.2),       # head (blinks)
    (0.3, 0.0, 0.0, 0.1, 0.7, 0.7, 1.0, 0.4),       # orbs
    (0.0, 0.0, 0.3, 0.1, 0.7, 1.0, 0.7, 0.4),
    (-0.3, 0.0, 0.0, 0.1, 1.0, 0.7, 0.7, 0.4),
    (0.0, 0.0, -0.3, 0.1, 0.5, 1.0, 1.0, 0.4),
    (0.3, 0.0, 0.1, 0.03, 0.4, 0.4, 0.4, 0.2),      # pebbles
    (0.1, 0.0, 0.3, 0.03, 0.4, 0.4, 0.4, 0.2),
    (-0.3, 0.0, 0.1, 0.03, 0.4, 0.4, 0.4, 0.2),
    (0.1, 0.0, -0.3, 0.03, 0.4, 0.4, 0.4, 0.2),
    (0.3, 0.0, -0.1, 0.03, 0.4, 0.4, 0.4, 0.2),
    (-0.1, 0.0, 0.3, 0.03, 0.4, 0.4, 0.4, 0.2),
    (-0.3, 0.0, -0.1, 0.03, 0.4, 0.4, 0.4, 0.2),
    (-0.1, 0.0, -0.3, 0.03, 0.4, 0.4, 0.4, 0.2),
]

_state = {
    "pos": [9.5, 0.3, 5.5],
    "vel": [1.0, 0.0],
    "head_col": (0.4, 0.4, 0.4),
    "handles": [],
}

for dx, dy, dz, r, b, g, rr, refl in PARTS:
    h = obj_new()                                    # noqa: F821
    obj_set(h, "sphere", r, refl,                    # noqa: F821
            _state["pos"][0] + dx, _state["pos"][1] + dy,
            _state["pos"][2] + dz, b, g, rr)
    _state["handles"].append(h)


def _blocked(c_here, c_next):
    # impassable: void, or stepping between '"' and '#/&' height levels
    return c_next == "." or (c_here in "#&" and c_next == '"')


def on_tick(sec_current, sec_delta):
    px, py, pz = _state["pos"]
    vx, vz = _state["vel"]

    blink = math.fmod(sec_current, 0.5) < 0.15
    head = (0.3, 0.3, 1.3) if blink else (0.3, 0.3, 0.3)

    rs = math.sin(sec_current * math.pi)
    rc = math.cos(sec_current * math.pi)
    for i, (dx, dy, dz, r, b, g, rr, refl) in enumerate(PARTS):
        wx = rc * dx + rs * dz
        wz = rc * dz - rs * dx
        if i == 1:
            b, g, rr = head
        obj_set(_state["handles"][i], "sphere", r, refl,   # noqa: F821
                px + wx, py + dy, pz + wz, b, g, rr)

    spd = 2.0
    here = level_get(math.floor(px), math.floor(pz))       # noqa: F821

    def ahead(nvx, nvz):
        nx = px + nvx * sec_delta * spd
        nz = pz + nvz * sec_delta * spd
        c = level_get(math.floor(nx + nvx * 0.5),          # noqa: F821
                      math.floor(nz + nvz * 0.5))
        return nx, nz, c

    nx, nz, c2 = ahead(vx, vz)
    if here != c2 and _blocked(here, c2):
        vx, vz = vz, -vx                      # turn right
        nx, nz, c2 = ahead(vx, vz)
        if here != c2 and _blocked(here, c2):
            vx, vz = -vx, -vz                 # reverse
            nx, nz, c2 = ahead(vx, vz)

    _state["pos"][0] = nx
    _state["pos"][2] = nz
    _state["vel"] = [vx, vz]
