"""SDL2 presenter shim (host/window.py) driven by a fake library.

The build image has no SDL2 or display, so these tests inject a fake
SDL object and verify the event decoding -> Keys mapping, the blit call
sequence, and graceful degradation when libSDL2 is absent.
"""

import ctypes
import struct

import numpy as np
import pytest

from pwnfps_tpu.host import window as Wn
from pwnfps_tpu.host.physics import Keys


class FakeSDL:
    """Mimics the ctypes surface of libSDL2 used by Presenter."""

    def __init__(self):
        self.events = []
        self.calls = []
        self.title = None
        # ctypes-function attributes the shim configures
        for name in ("SDL_CreateWindow", "SDL_GetWindowSurface",
                     "SDL_CreateRGBSurfaceFrom", "SDL_GetError"):
            setattr(self, name, _Callable(self, name))
        for name in ("SDL_Init", "SDL_UpperBlit", "SDL_FreeSurface",
                     "SDL_UpdateWindowSurface", "SDL_DestroyWindow",
                     "SDL_Quit", "SDL_SetWindowTitle"):
            setattr(self, name, _Callable(self, name))

    def SDL_PollEvent(self, buf):
        if not self.events:
            return 0
        raw = self.events.pop(0)
        ctypes.memmove(buf, raw, len(raw))
        return 1


class _Callable:
    def __init__(self, owner, name):
        self.owner = owner
        self.name = name
        self.restype = None
        self.argtypes = None

    def __call__(self, *a):
        self.owner.calls.append((self.name, a))
        if self.name == "SDL_Init":
            return 0
        if self.name == "SDL_SetWindowTitle":
            self.owner.title = a[1]
        if self.name in ("SDL_CreateWindow", "SDL_GetWindowSurface",
                         "SDL_CreateRGBSurfaceFrom"):
            return 0xDEAD
        return 0


def key_event(etype, scancode):
    # u32 type, u32 timestamp, u32 windowID, u8 state, u8 repeat,
    # u8[2] pad, i32 scancode ... (SDL_KeyboardEvent prefix)
    return struct.pack("<IIIBBxxi", etype, 0, 0,
                       1 if etype == Wn.SDL_KEYDOWN else 0, 0, scancode)


@pytest.fixture
def pres():
    return Wn.Presenter(320, 200, 3, sdl=FakeSDL())


def test_window_opens_at_reference_geometry(pres):
    (name, args) = next(c for c in pres.sdl.calls
                        if c[0] == "SDL_CreateWindow")
    assert args[3] == 960 and args[4] == 600   # 320x200 x3, main.c:394


def test_key_mapping_reference_bindings(pres):
    sdl = pres.sdl
    sdl.events = [key_event(Wn.SDL_KEYDOWN, Wn.SC_UP),
                  key_event(Wn.SDL_KEYDOWN, Wn.SC_A),
                  key_event(Wn.SDL_KEYDOWN, Wn.SC_LEFT)]
    keys, quit_ = pres.poll()
    assert keys.forward and keys.left and keys.turnleft and not quit_
    sdl.events = [key_event(Wn.SDL_KEYUP, Wn.SC_UP),
                  key_event(Wn.SDL_KEYDOWN, Wn.SC_D)]
    keys, quit_ = pres.poll()
    assert not keys.forward and keys.right and keys.left


def test_quit_paths(pres):
    pres.sdl.events = [struct.pack("<I", Wn.SDL_QUIT) + b"\0" * 52]
    _, quit_ = pres.poll()
    assert quit_
    pres.sdl.events = [key_event(Wn.SDL_KEYDOWN, Wn.SC_ESCAPE)]
    _, quit_ = pres.poll()
    assert quit_


def test_present_blits_upscaled_frame(pres):
    fb = np.zeros((200, 320), np.uint32)
    pres.present(fb)
    names = [c[0] for c in pres.sdl.calls]
    i = names.index("SDL_CreateRGBSurfaceFrom")
    args = pres.sdl.calls[i][1]
    assert args[1] == 960 and args[2] == 600   # upscaled dims
    assert names.index("SDL_UpperBlit") < names.index(
        "SDL_UpdateWindowSurface")


def test_missing_sdl_raises_cleanly(monkeypatch):
    monkeypatch.setattr(Wn, "load_sdl", lambda: None)
    with pytest.raises(RuntimeError, match="libSDL2 not found"):
        Wn.Presenter(320, 200, 3)
