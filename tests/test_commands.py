"""Command catalog + portable handlers tests (mirrors reference
MenuStateTest / TestGuiShared coverage)."""

import numpy as np

from fractalshark_tpu.core.commands import (FractalCommand, K_COMMANDS,
                                            PortableCommandHandlers,
                                            find_command_for_key)
from fractalshark_tpu.engine.fractal import Fractal


def mk():
    f = Fractal(width=16, height=16, view=0, algorithm="Cpu64",
                num_iterations=64, backend="cpu")
    return f, PortableCommandHandlers(f)


def test_idm_numeric_compatibility():
    # ids mirror the reference IDM_* values
    assert FractalCommand.ZOOM_IN == 40102
    assert FractalCommand.STANDARD_VIEW == 40200
    assert FractalCommand.view(5) == 40205
    assert FractalCommand.RESET_ITERATIONS == 40400


def test_hotkey_lookup():
    assert find_command_for_key("z") == FractalCommand.ZOOM_IN
    assert find_command_for_key("z", shift=True) == FractalCommand.ZOOM_OUT
    assert find_command_for_key("?") == FractalCommand.NONE
    # every hotkey in the table is unique
    keys = [(e.hotkey.key, e.hotkey.shift, e.hotkey.ctrl, e.hotkey.alt)
            for e in K_COMMANDS if e.hotkey]
    assert len(keys) == len(set(keys))


def test_zoom_back_round_trip():
    f, h = mk()
    z0 = f.ptz.zoom_factor.exponent2()
    h.dispatch(FractalCommand.ZOOM_IN)
    assert f.ptz.zoom_factor.exponent2() == z0 + 1
    h.dispatch(FractalCommand.BACK)
    assert f.ptz.zoom_factor.exponent2() == z0


def test_iteration_commands():
    f, h = mk()
    h.dispatch(FractalCommand.INCREASE_ITERATIONS_1P5X)
    assert f.num_iterations == 96
    h.dispatch(FractalCommand.RESET_ITERATIONS)
    assert f.num_iterations == 256
    h.dispatch(FractalCommand.DECREASE_ITERATIONS)
    assert f.num_iterations == 170


def test_view_preset_command():
    f, h = mk()
    h.dispatch(FractalCommand.view(5))
    assert f.num_iterations == 4718592  # view 5's budget


def test_palette_and_aa_commands():
    f, h = mk()
    h.dispatch(FractalCommand.AA_4X)
    assert f.antialiasing == 2
    h.dispatch(FractalCommand.PALETTE_TYPE_3)
    assert f.palette.palette_type == "Summer"
    d0 = f.palette.depth_index
    h.dispatch(FractalCommand.PALETTE_DEPTH_NEXT)
    assert f.palette.depth_index == (d0 + 1) % 6


def test_save_png_and_location(tmp_path):
    f, h = mk()
    png = str(tmp_path / "out.png")
    h.dispatch(FractalCommand.SAVE_PNG, path=png)
    from fractalshark_tpu.io.png import read_png
    assert read_png(png).shape == (16, 16, 4)
    loc = str(tmp_path / "loc.txt")
    h.dispatch(FractalCommand.SAVE_LOCATION, path=loc,
               description="cmd test")
    from fractalshark_tpu.io.saved_location import load_locations
    assert load_locations(loc)[0].description == "cmd test"


def test_show_hotkeys_and_curpos():
    f, h = mk()
    h.dispatch(FractalCommand.SHOW_HOTKEYS)
    h.dispatch(FractalCommand.CUR_POS)
    assert any("Zoom in here" in m for m in h.messages)
    assert any("center=" in m for m in h.messages)


def test_exit_returns_false():
    f, h = mk()
    called = []
    h.on_exit = lambda: called.append(1)
    assert h.dispatch(FractalCommand.EXIT) is False
    assert called
