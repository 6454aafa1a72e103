"""QM9-style molecular graphs: variable-size padded batching (config 2,
BASELINE.json:8).

The sandbox has no network access, so this module ships a *synthetic* QM9
stand-in with the same data interface: molecules of 3..29 atoms, 5 species
(H C N O F one-hot), 3D conformer-like geometry, and a smooth rotation-
invariant scalar target (a function of the pairwise-distance spectrum, so a
model must use geometry to fit it).  Swap ``generate_molecules`` for a real
QM9 loader when data is available — the batching/padding path is identical.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

__all__ = ["generate_molecules", "batch_molecules", "NUM_SPECIES"]

NUM_SPECIES = 5
_COV_RADII = np.array([0.32, 0.75, 0.71, 0.63, 0.64])  # H C N O F (Å-ish)


def _random_molecule(rng: np.random.Generator, min_atoms=3, max_atoms=29):
    n = int(rng.integers(min_atoms, max_atoms + 1))
    species = rng.integers(0, NUM_SPECIES, n)
    # grow a loose cluster: each atom near a previous one (molecule-like)
    pos = np.zeros((n, 3))
    for i in range(1, n):
        j = int(rng.integers(0, i))
        d = _COV_RADII[species[i]] + _COV_RADII[species[j]] + 0.3 * rng.random()
        u = rng.standard_normal(3)
        u /= np.linalg.norm(u)
        pos[i] = pos[j] + d * u
    pos -= pos.mean(0)
    # invariant target: smooth function of the distance spectrum + composition
    dmat = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    target = float(
        np.exp(-dmat[dmat > 0]).sum() / n + 0.1 * np.bincount(species, minlength=5) @ np.arange(1, 6) / n
    )
    return {"species": species, "positions": pos.astype(np.float32), "target": target}


def generate_molecules(num: int, seed: int = 0, max_atoms: int = 29) -> List[dict]:
    rng = np.random.default_rng(seed)
    return [_random_molecule(rng, max_atoms=max_atoms) for _ in range(num)]


def batch_molecules(
    molecules: List[dict],
    nodes_per_graph: int = 29,
    radius: float = 2.0,
    max_neighbors: int = 16,
):
    """Pad each molecule to ``nodes_per_graph`` and build intra-molecule radius
    edges (exact brute force per molecule — molecules are tiny).

    Returns a SteerableGraph (one flat address space, receiver-sorted edges,
    trash-padding) plus targets [G] and per-node features
    [N, NUM_SPECIES] (species one-hot; 0 rows on padding).
    """
    import jax.numpy as jnp

    from ..graph.container import SteerableGraph

    G = len(molecules)
    Np = nodes_per_graph
    K = max_neighbors
    feats = np.zeros((G * Np, NUM_SPECIES), np.float32)
    pos = np.zeros((G * Np, 3), np.float32)
    node_mask = np.zeros((G * Np,), bool)
    node_graph = np.full((G * Np,), G, np.int32)
    senders_all, receivers_all, mask_all = [], [], []
    for g, mol in enumerate(molecules):
        n = len(mol["species"])
        base = g * Np
        feats[base : base + n] = np.eye(NUM_SPECIES, dtype=np.float32)[mol["species"]]
        pos[base : base + n] = mol["positions"]
        node_mask[base : base + n] = True
        node_graph[base : base + n] = g
        d = np.linalg.norm(
            mol["positions"][:, None] - mol["positions"][None, :], axis=-1
        )
        for i in range(Np):
            if i < n:
                nb = np.where((d[i] <= radius) & (np.arange(n) != i))[0]
                nb = nb[np.argsort(d[i][nb])][:K]
            else:
                nb = np.zeros((0,), np.int64)
            k = len(nb)
            senders_all.append(base + nb)
            senders_all.append(np.full((K - k,), G * Np, np.int64))
            receivers_all.append(np.full((k,), base + i, np.int64))
            receivers_all.append(np.full((K - k,), base + i, np.int64))
            mask_all.append(np.ones((k,), bool))
            mask_all.append(np.zeros((K - k,), bool))
    senders = np.concatenate(senders_all).astype(np.int32)
    receivers = np.concatenate(receivers_all).astype(np.int32)
    mask = np.concatenate(mask_all)
    graph = SteerableGraph(
        nodes=jnp.asarray(feats),
        positions=jnp.asarray(pos),
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        node_graph=jnp.asarray(node_graph),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(mask),
        n_graphs=G,
    )
    targets = np.asarray([m["target"] for m in molecules], np.float32)
    return graph, jnp.asarray(targets)
