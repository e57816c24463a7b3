"""Procedural non-Euclidean level generation (BASELINE config #3).

Generates 64x64 worlds in the reference's level grammar: open sectors
carved by a cellular-automata cave pass (run as jnp ops on device),
decorated with 2-high halls, fog pockets, ramps, and up to 26
portal pairs placed on straight walls - including optional lowercase
"aliased" portals for one-way euclidfuckery (level.h:144-178 semantics).

The output is ordinary level text, so it flows through the same level
compiler, parity oracle, and renderer as hand-authored maps.
"""

from __future__ import annotations

import numpy as np

from .cells import celltype_is_free
from .levelc import LevelData, compile_level


def _cave_grid(seed: int, density: float, iters: int) -> np.ndarray:
    """Cellular-automata cave: True = open. Runs as jnp ops on device."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    open_ = jax.random.uniform(key, (64, 64)) > density

    def smooth(g, _):
        gi = g.astype(jnp.int32)
        n = (jnp.roll(gi, 1, 0) + jnp.roll(gi, -1, 0)
             + jnp.roll(gi, 1, 1) + jnp.roll(gi, -1, 1)
             + jnp.roll(jnp.roll(gi, 1, 0), 1, 1)
             + jnp.roll(jnp.roll(gi, 1, 0), -1, 1)
             + jnp.roll(jnp.roll(gi, -1, 0), 1, 1)
             + jnp.roll(jnp.roll(gi, -1, 0), -1, 1))
        return (n + gi * 2) >= 5, None

    open_, _ = jax.lax.scan(smooth, open_, None, length=iters)
    open_ = open_.at[0, :].set(False).at[-1, :].set(False)
    open_ = open_.at[:, 0].set(False).at[:, -1].set(False)
    return np.asarray(open_)


def generate_maze(seed: int = 0, density: float = 0.44,
                  n_portals: int = 26, fog: bool = True,
                  tall: bool = True, ramps: bool = True,
                  lowercase: int = 4) -> LevelData:
    """Build a procedural level; returns the compiled LevelData."""
    rng = np.random.default_rng(seed)
    open_ = _cave_grid(seed, density, iters=4)

    # keep only the largest connected open component (flood fill)
    from collections import deque
    best, bestn = None, 0
    seen = np.zeros_like(open_, bool)
    for z in range(64):
        for x in range(64):
            if open_[z, x] and not seen[z, x]:
                comp = []
                dq = deque([(z, x)])
                seen[z, x] = True
                while dq:
                    cz, cx = dq.popleft()
                    comp.append((cz, cx))
                    for dz, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        nz, nx = cz + dz, cx + dx
                        if (0 <= nz < 64 and 0 <= nx < 64
                                and open_[nz, nx] and not seen[nz, nx]):
                            seen[nz, nx] = True
                            dq.append((nz, nx))
                if len(comp) > bestn:
                    best, bestn = comp, len(comp)
    grid = np.full((64, 64), ord("."), np.uint8)
    for z, x in best:
        grid[z, x] = ord(";")

    cells = np.array(best)

    def region(char, count, size):
        for _ in range(count):
            cz, cx = cells[rng.integers(len(cells))]
            for dz in range(-size, size + 1):
                for dx in range(-size, size + 1):
                    z, x = cz + dz, cx + dx
                    if 1 <= z <= 62 and 1 <= x <= 62 \
                            and grid[z, x] == ord(";"):
                        grid[z, x] = ord(char)

    if tall:
        region("#", 6, 2)
    if fog:
        region("$", 5, 2)
    if ramps:
        # ramps only where both sides stay walkable
        for _ in range(12):
            cz, cx = cells[rng.integers(len(cells))]
            c = rng.choice([">", "<", ",", "^"])
            if grid[cz, cx] == ord(";"):
                grid[cz, cx] = ord(c)

    # portals: straight wall cells with exactly one free 4-neighbour
    sites = []
    for z in range(2, 62):
        for x in range(2, 62):
            if grid[z, x] != ord("."):
                continue
            free = [celltype_is_free(int(grid[z + dz, x + dx]))
                    for dz, dx in ((0, 1), (1, 0), (0, -1), (-1, 0))]
            if sum(free) == 1:
                sites.append((z, x))
    rng.shuffle(sites)
    placed = 0
    next_letter = 0
    used = np.zeros((64, 64), bool)
    for (z1, x1) in sites:
        if placed >= n_portals or next_letter >= 26:
            break
        if used[max(z1 - 1, 0):z1 + 2, max(x1 - 1, 0):x1 + 2].any():
            continue
        for (z2, x2) in sites[::-1]:
            if (z2, x2) == (z1, x1) or used[z2, x2] \
                    or abs(z2 - z1) + abs(x2 - x1) < 8:
                continue
            if used[max(z2 - 1, 0):z2 + 2, max(x2 - 1, 0):x2 + 2].any():
                continue
            alias = placed < lowercase and next_letter + 1 < 26 \
                and next_letter < 24  # 'y' is the last aliasable letter
            if alias:
                # lowercase endpoint rewrites to the NEXT letter and
                # registers under both slots (level.h:144-178): the pair
                # works via this slot, but the written cell displays the
                # next letter whose slot stays half-open -> one-way
                # portal. The next letter is consumed.
                grid[z1, x1] = ord("a") + next_letter
                grid[z2, x2] = ord("A") + next_letter
                next_letter += 2
            else:
                grid[z1, x1] = ord("A") + next_letter
                grid[z2, x2] = ord("A") + next_letter
                next_letter += 1
            used[z1, x1] = used[z2, x2] = True
            placed += 1
            break

    # spawn: first open cell of the main component
    sz, sx = best[len(best) // 2]
    grid[sz, sx] = ord("*")

    text = b"\n".join(bytes(grid[z]).rstrip(b".") or b"." for z in
                      range(64)) + b"\n"
    lv = compile_level(text)
    return lv


def make_portal_chain(n_pairs: int = 8) -> LevelData:
    """Stress level (BASELINE config #2): a corridor where a straight ray
    traverses `n_pairs` chained portals (plus more on each bounce)."""
    assert 1 <= n_pairs <= 11, "corridor layout fits <= 11 pairs in 64"
    row = [".", ";", "*"]
    for k in range(n_pairs):
        letter = chr(ord("A") + k)
        row += [letter, ".", letter, ";", ";"]
    row += [";", "."]
    width = len(row)
    assert width <= 64
    lines = ["." * width,
             "".join(row),
             "." * width]
    text = "\n".join(lines) + "\n"
    return compile_level(text.encode())


def maze_text(lv: LevelData) -> str:
    return "\n".join("".join(chr(c) for c in row).rstrip(".")
                     for row in lv.grid)
