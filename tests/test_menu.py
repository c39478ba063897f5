"""Declarative menu tree (reference MenuTree.h / MenuTreeDef.h):
catalog consistency and state-dependent rendering."""

from fractalshark_tpu.core import menu
from fractalshark_tpu.core.commands import FractalCommand as FC


def test_validates_against_catalog():
    assert menu.validate() == []


def test_contains_scan_and_file_groups():
    labels = [n.label for n, _ in menu.walk()]
    for want in ("Navigate", "Feature Finder", "Direct Scan",
                 "Views", "File", "Save Image (PNG)", "Exit"):
        assert want in labels, want


def test_rules_disable_without_state():
    class H:
        last_feature = None
        history = ()
        nr_checkpoint_path = None

    txt = menu.render_text(H())
    assert "Zoom to Found Feature" in txt
    line = [l for l in txt.splitlines()
            if "Zoom to Found Feature" in l][0]
    assert "(disabled)" in line
    line = [l for l in txt.splitlines() if "Back" in l][0]
    assert "(disabled)" in line


def test_rules_enable_with_state():
    class H:
        last_feature = object()
        history = (1,)
        nr_checkpoint_path = None

    txt = menu.render_text(H())
    line = [l for l in txt.splitlines()
            if "Zoom to Found Feature" in l][0]
    assert "(disabled)" not in line


def test_radio_checkmarks():
    txt = menu.render_text(
        checked={menu.RadioGroup.ANTIALIASING: FC.AA_4X})
    lines = txt.splitlines()
    assert [l for l in lines if "(*) 4x" in l]
    assert [l for l in lines if "( ) 1x" in l]
