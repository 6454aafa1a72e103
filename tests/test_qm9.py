"""QM9-style padded batching (config 2): mask-invariance — adding pad atoms
never changes outputs (SURVEY.md §4.3) — plus a short training gate."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.data.qm9 import NUM_SPECIES, batch_molecules, generate_molecules
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.train.pipeline import make_train_state, make_train_step


def _model(num_layers=2):
    return SEGNN(
        Irreps(f"{NUM_SPECIES}x0e"), Irreps("16x0e+8x1o"), Irreps("1x0e"),
        num_layers=num_layers, task="graph",
    )


def test_batching_shapes_and_masks():
    mols = generate_molecules(6, seed=0)
    g, targets = batch_molecules(mols, nodes_per_graph=29)
    assert g.nodes.shape == (6 * 29, NUM_SPECIES)
    assert targets.shape == (6,)
    assert int(g.node_mask.sum()) == sum(len(m["species"]) for m in mols)
    r = np.array(g.receivers)
    assert (np.diff(r) >= 0).all()
    # no valid edge crosses molecules
    s, rr, m = np.array(g.senders), r, np.array(g.edge_mask)
    assert ((s[m] // 29) == (rr[m] // 29)).all()


def test_pad_invariance():
    """29-padded vs 35-padded molecules give identical graph outputs."""
    mols = generate_molecules(4, seed=1)
    model = _model()
    params = model.init(jax.random.key(0))
    g1, t1 = batch_molecules(mols, nodes_per_graph=29)
    g2, _ = batch_molecules(mols, nodes_per_graph=35)
    o1 = np.array(model(params, g1))
    o2 = np.array(model(params, g2))
    np.testing.assert_allclose(o1, o2, atol=1e-5)


def test_graph_regression_trains():
    mols = generate_molecules(32, seed=2)
    g, targets = batch_molecules(mols)
    model = _model()
    params = model.init(jax.random.key(1))
    opt = optax.adam(3e-3)

    def loss_fn(p, graph, t):
        pred = model(p, graph)[:, 0]
        return jnp.mean((pred - t) ** 2)

    step = make_train_step(loss_fn, opt)
    state = make_train_state(params, opt)
    first = None
    for i in range(80):
        state, m = step(state, g, targets)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < 0.5 * first, (first, float(m["loss"]))


def test_load_qm9_parses_real_format(tmp_path):
    """The real-QM9 loader parses the dsgdb9nsd .xyz record format
    (Fortran D-notation floats included) into the standard molecule dicts."""
    from scalable_e3_gnn_tpu.data.qm9 import load_qm9

    rec = (
        "3\n"
        "gdb 42\t157.7\t157.7\t157.7\t0.0\t13.21\t-0.3877\t0.1171\t0.5048\t"
        "35.36\t0.044749\t-40.478930\t-40.476062\t-40.475117\t-40.498597\t6.469\n"
        "C\t-0.0126981359\t1.0858041578\t0.0080009958\t-0.535689\n"
        "H\t0.002150416\t-0.0060313176\t0.0019761204\t0.133921\n"
        "O\t1.0117308433\t1.4637511618\t2.7*^-4\t0.133922\n"
        "1341.307\t1341.3284\t1341.365\n"
        "C\tC\n"
        "InChI=1S/CH4/h1H4\tInChI=1S/CH4/h1H4\n"
    )
    (tmp_path / "dsgdb9nsd_000042.xyz").write_text(rec)
    mols = load_qm9(str(tmp_path), target="U0")
    assert len(mols) == 1
    m = mols[0]
    assert m["species"].tolist() == [1, 0, 3]  # C H O
    assert abs(m["target"] - (-40.478930)) < 1e-9
    assert abs(m["positions"][2, 2] - 2.7e-4) < 1e-9
    # batches through the standard path
    g, t = batch_molecules(mols)
    assert g.n_graphs == 1 and t.shape == (1,)

    import pytest

    with pytest.raises(FileNotFoundError):
        load_qm9(str(tmp_path / "missing"))
    with pytest.raises(ValueError):
        load_qm9(str(tmp_path), target="nope")


def test_load_qm9_committed_fixtures():
    """End-to-end on VERBATIM-format dsgdb9nsd records committed as fixtures
    (tests/fixtures/qm9): tab-separated 'gdb <idx>' property line, Mulliken
    charge column, trailing frequency/SMILES/InChI lines, and a ``*^``
    Fortran-notation float (water record, H z-coordinate 8.001*^-6)."""
    import os

    from scalable_e3_gnn_tpu.data.qm9 import load_qm9

    fdir = os.path.join(os.path.dirname(__file__), "fixtures", "qm9")
    mols = load_qm9(fdir, target="U0")
    assert len(mols) == 3  # CH4, NH3, H2O in gdb order
    ch4, nh3, h2o = mols
    assert ch4["species"].tolist() == [1, 0, 0, 0, 0]
    assert nh3["species"].tolist() == [2, 0, 0, 0]
    assert h2o["species"].tolist() == [3, 0, 0]
    assert abs(ch4["target"] - (-40.47893)) < 1e-9
    assert abs(h2o["target"] - (-76.404702)) < 1e-9
    # the *^ branch: 8.001*^-6 -> 8.001e-6
    assert abs(h2o["positions"][1, 2] - 8.001e-6) < 1e-12
    # a different property column resolves correctly too
    gaps = [m["target"] for m in load_qm9(fdir, target="gap")]
    np.testing.assert_allclose(gaps, [0.5048, 0.3399, 0.3615])

    # full path: batch + model forward on real-format molecules
    g, t = batch_molecules(mols)
    model = _model()
    params = model.init(jax.random.key(3))
    out = np.array(model(params, g))
    assert out.shape == (3, 1) and np.isfinite(out).all()


def _write_xyz(path, idx, rng):
    """One synthetic molecule in verbatim dsgdb9nsd format (incl. tab-
    separated property line and a Fortran-notation float)."""
    from scalable_e3_gnn_tpu.data.qm9 import _random_molecule

    m = _random_molecule(rng, min_atoms=3, max_atoms=9)
    syms = "HCNOF"
    n = len(m["species"])
    props = [f"{rng.uniform(100, 800):.5f}"] * 3 + [
        f"{rng.uniform(0, 3):.4f}", f"{rng.uniform(6, 35):.2f}",
        f"{-rng.uniform(0.2, 0.4):.4f}", f"{rng.uniform(0.0, 0.2):.4f}",
        f"{rng.uniform(0.2, 0.5):.4f}", f"{rng.uniform(19, 36):.4f}",
        f"{rng.uniform(0.02, 0.05):.6f}",
        f"{m['target']:.6f}",  # U0 = the synthetic invariant target (Ha)
        f"{m['target'] + 0.003:.6f}", f"{m['target'] + 0.004:.6f}",
        f"{m['target'] - 0.02:.6f}", f"{rng.uniform(6, 7):.3f}",
    ]
    lines = [str(n), "gdb " + str(idx) + "\t" + "\t".join(props) + "\t"]
    for i in range(n):
        x, y, z = m["positions"][i]
        zs = f"{z:.10f}" if i else "8.001*^-6"  # exercise Fortran notation
        lines.append(f"{syms[m['species'][i]]}\t {x:.10f}\t {y:.10f}\t {zs}\t {rng.uniform(-0.5, 0.5):.6f}")
    lines.append("1341.307\t2161.77\t")
    lines.append("C\tC\t")
    lines.append("InChI=1S/test\tInChI=1S/test")
    path.write_text("\n".join(lines) + "\n")


def test_qm9_protocol_full_path(tmp_path):
    """Fixture-driven end-to-end run of the literature eval protocol:
    parse -> uncharacterized exclusion -> deterministic split ->
    train-split z-scoring -> train -> per-split MAE in meV (VERDICT r4
    missing #3)."""
    from scalable_e3_gnn_tpu.data.qm9 import (
        HARTREE_TO_MEV, load_qm9, load_uncharacterized, split_qm9, target_unit)
    from scalable_e3_gnn_tpu.train.runners import run_qm9_protocol

    rng = np.random.default_rng(0)
    n_files = 40
    for i in range(1, n_files + 1):
        _write_xyz(tmp_path / f"dsgdb9nsd_{i:06d}.xyz", i, rng)
    # companion exclusion file in the published layout (header + indexed rows)
    (tmp_path / "uncharacterized.txt").write_text(
        "list of molecules that failed consistency\n\n"
        "  3   text text\n  7   text text\n\n3054 molecules\n"
    )
    excl = load_uncharacterized(str(tmp_path))
    assert excl == {3, 7, 3054}

    mols = load_qm9(str(tmp_path), target="U0", exclude=excl)
    assert len(mols) == n_files - 2  # 3 and 7 excluded
    assert all(m["index"] not in (3, 7) for m in mols)

    tr, va, te = split_qm9(mols, seed=0)
    assert len(tr) + len(va) + len(te) == len(mols)
    assert len(tr) > len(va) >= 1 and len(te) >= 1
    # deterministic: same seed -> same split
    tr2, _, _ = split_qm9(mols, seed=0)
    assert [m["index"] for m in tr] == [m["index"] for m in tr2]

    factor, unit = target_unit("U0")
    assert unit == "meV" and factor == HARTREE_TO_MEV
    assert target_unit("mu") == (1.0, "D")

    res = run_qm9_protocol(str(tmp_path), target="U0", steps=4, batch_size=8,
                           seed=0)
    assert res["unit"] == "meV"
    assert res["n_train"] == len(tr) and res["n_val"] == len(va)
    assert res["n_excluded"] == 3
    assert np.isfinite(res["val_mae"]) and np.isfinite(res["test_mae"])
    assert np.isfinite(res["final_loss"])
    # MAE is reported in meV: the synthetic U0 spread is O(0.1 Ha), so a
    # barely-trained model's MAE must be orders of magnitude above 1 meV
    assert res["test_mae"] > 10.0
