"""Executable oracle: run the reference L1TensorProduct under torch + a stub e3nn.

SURVEY.md §4.2 recipe.  The reference file (read-only, GPL) is imported
directly from /root/reference — never copied — and executed on CPU torch with a
minimal ``e3nn.o3`` stub backed by this framework's own Irreps implementation
(the API subset is documented in SURVEY.md §2.3).  Used only by the parity test
suite as ground truth; skipped cleanly if the reference mount is absent.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REFERENCE_FILE = Path("/root/reference/models/segnn/l1_tensor_prod.py")


def reference_available() -> bool:
    return REFERENCE_FILE.exists()


def _install_e3nn_stub():
    """Install a fake ``e3nn.o3`` exposing Irreps/Instruction (SURVEY.md §2.3)."""
    if "e3nn.o3" in sys.modules:
        return
    from scalable_e3_gnn_tpu.core.irreps import Instruction, Irrep, Irreps, MulIrrep

    o3 = types.ModuleType("e3nn.o3")
    o3.Irreps = Irreps
    o3.Irrep = Irrep
    o3.MulIrrep = MulIrrep
    o3.Instruction = Instruction
    e3nn = types.ModuleType("e3nn")
    e3nn.o3 = o3
    sys.modules["e3nn"] = e3nn
    sys.modules["e3nn.o3"] = o3


def load_reference_module():
    """Import the reference l1_tensor_prod.py as a module (torch CPU)."""
    _install_e3nn_stub()
    spec = importlib.util.spec_from_file_location("ref_l1_tensor_prod", REFERENCE_FILE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_reference_tp(in1_irreps: str, out_irreps: str | None = None, **kwargs):
    """Construct the reference L1TensorProduct for the given specs."""
    from scalable_e3_gnn_tpu.core.irreps import Irreps

    mod = load_reference_module()
    out = Irreps(out_irreps) if out_irreps is not None else None
    return mod.L1TensorProduct(Irreps(in1_irreps), out, **kwargs)
