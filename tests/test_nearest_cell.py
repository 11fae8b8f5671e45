"""Cell-aligned nearest-fine-voxel lookup vs exact NN oracle."""
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.models.eprecon import nearest_fine_in_cell


def test_nearest_in_cell_matches_incell_nn(rng):
    dim = (16, 16, 16)
    n_fine = 120
    coords = np.unique(rng.integers(0, 16, (n_fine, 3)).astype(np.int32), axis=0)
    n_fine = len(coords)
    table = np.full(dim, -1, np.int32)
    for r, c in enumerate(coords):
        table[tuple(c)] = r

    # coarse voxels at stride 2, only where their cell has a fine voxel
    parents = np.unique(coords // 2, axis=0)
    coarse = parents * 2
    rows = np.asarray(nearest_fine_in_cell(jnp.asarray(table),
                                           jnp.asarray(coarse), 2))
    for i, cc in enumerate(coarse):
        # oracle: fine voxels within the cell, nearest to the corner cc
        in_cell = [(r, c) for r, c in enumerate(coords)
                   if (c // 2 == cc // 2).all()]
        assert in_cell
        d = [((c - cc) ** 2).sum() for _, c in in_cell]
        best = min(d)
        got_c = coords[rows[i]]
        assert ((got_c - cc) ** 2).sum() == best
        assert (got_c // 2 == cc // 2).all()


def test_nearest_in_cell_stride4(rng):
    dim = (16, 16, 16)
    coords = np.unique(rng.integers(0, 16, (60, 3)).astype(np.int32), axis=0)
    table = np.full(dim, -1, np.int32)
    for r, c in enumerate(coords):
        table[tuple(c)] = r
    parents = np.unique(coords // 4, axis=0)
    coarse = parents * 4
    rows = np.asarray(nearest_fine_in_cell(jnp.asarray(table),
                                           jnp.asarray(coarse), 4))
    for i, cc in enumerate(coarse):
        got_c = coords[rows[i]]
        assert (got_c // 4 == cc // 4).all()
