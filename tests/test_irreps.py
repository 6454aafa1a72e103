"""Unit tests: irreps algebra (SURVEY.md §4.3 'unit' tier)."""

import numpy as np
import pytest

from scalable_e3_gnn_tpu.core.irreps import Irrep, Irreps, MulIrrep


def test_parse_and_dims():
    ir = Irreps("4x0e+2x0o+3x1o+2x1e")
    assert len(ir) == 4
    assert ir.dim == 4 + 2 + 9 + 6
    assert ir.lmax == 1
    assert ir.num_irreps == 11
    assert [mi.mul for mi in ir] == [4, 2, 3, 2]
    assert [mi.ir.l for mi in ir] == [0, 0, 1, 1]
    assert [mi.ir.p for mi in ir] == [1, -1, -1, 1]
    assert repr(ir) == "4x0e+2x0o+3x1o+2x1e"


def test_single_and_empty():
    assert Irreps("0e").dim == 1
    assert Irreps("").dim == 0
    assert Irreps(None).dim == 0
    assert Irreps(Irrep(2, 1)).dim == 5
    assert Irreps([(3, "1o")]).dim == 9


def test_spherical_harmonics_irreps():
    sh = Irreps.spherical_harmonics(1)
    assert repr(sh) == "1x0e+1x1o"
    assert sh.dim == 4
    sh2 = Irreps.spherical_harmonics(2)
    assert repr(sh2) == "1x0e+1x1o+1x2e"
    assert sh2.dim == 9


def test_slices():
    ir = Irreps("2x0e+1x1o")
    assert ir.slices() == [slice(0, 2), slice(2, 5)]


def test_add_mul():
    a = Irreps("2x0e") + Irreps("1x1o")
    assert repr(a) == "2x0e+1x1o"
    assert repr(Irreps("1x0e") * 2) == "1x0e+1x0e"


def test_simplify_sort_regroup():
    ir = Irreps("1x1o+2x0e+3x0e+1x1o")
    assert repr(ir.simplify()) == "1x1o+5x0e+1x1o"
    assert repr(ir.regroup()) == "5x0e+2x1o"
    assert ir.regroup().is_blockwise()


def test_contiguous_slice():
    ir = Irreps("4x0e+3x1o")
    assert ir.contiguous_slice_for("0e") == slice(0, 4)
    assert ir.contiguous_slice_for("1o") == slice(4, 13)
    assert ir.contiguous_slice_for("2e") == slice(0, 0)
    bad = Irreps("1x0e+1x1o+1x0e")
    with pytest.raises(ValueError):
        bad.contiguous_slice_for("0e")


def test_irrep_product_selection_rule():
    out = list(Irrep.parse("1o") * Irrep.parse("1o"))
    assert out == [Irrep(0, 1), Irrep(1, 1), Irrep(2, 1)]
    out = list(Irrep.parse("1o") * Irrep.parse("0e"))
    assert out == [Irrep(1, -1)]


def test_mulirrep_destructure():
    mul, ir = MulIrrep(5, Irrep(1, -1))
    assert mul == 5 and ir == Irrep(1, -1)
