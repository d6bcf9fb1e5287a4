#!/usr/bin/env python3
"""Run the ACTUAL reference (puffbird, /root/reference) on shared puffy
fixtures and dump long-format outputs as CSV — the differential-golden
side A. Side B is graft.GoldenDump (same fixtures via the Spark engine);
tools/compare_golden.py diffs them.
"""
import sys, types, os

xr = types.ModuleType('xarray'); xr.DataArray = object; xr.Dataset = object
sys.modules['xarray'] = xr
sys.path.insert(0, '/root/reference')

import warnings
warnings.filterwarnings('ignore')
import numpy as np
import pandas as pd
import puffbird as pb

OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/ref_golden'
os.makedirs(OUT, exist_ok=True)


def dump(name, df):
    df = df.reset_index(drop=True)
    df.to_csv(f"{OUT}/{name}.csv", index=False)
    print(f"{name}: {len(df)} rows, cols={list(df.columns)}")


# c1 — F1 canonical docstring frame (frame.py:112-117)
f1 = pd.DataFrame({
    'a': [[1, 2, 3], [4, 5, 6, 7], [3, 4, 5]],
    'b': [{'c': ['asdf'], 'd': ['ret']}, {'d': ['r']}, {'c': ['ff']}],
})
dump('c1_f1', pb.puffy_to_long(f1))

# c2 — 2-D ndarray column → two positional levels
f2 = pd.DataFrame({'b': [np.array([[1., 2., 3.], [4., 5., 6.]]),
                         np.array([[7., 8., 9.], [10., 11., 12.]])]})
dump('c2_2d', pb.puffy_to_long(f2, 'b'))

# c3 — shared axis across two array columns
f3 = pd.DataFrame({'x': [[1, 2, 3], [4, 5]],
                   'y': [[10, 20, 30], [40, 50]]})
dump('c3_shared', pb.puffy_to_long(f3, axis={'x': 0, 'y': 0}))

# c4 — scalar column merged with an array column
f4 = pd.DataFrame({'s': ['u', 'v'], 'a': [[1, 2], [3]]})
dump('c4_scalar_mix', pb.puffy_to_long(f4))

# c5 — missing cells with dropna=True. (dropna=False CRASHES in the
# reference — `iter(None)` in DEFAULT_ITERABLE, callables.py:52 — so the
# engine's keep-null-rows behavior is a documented improvement, see
# DIVERGENCES.md.)
f5 = pd.DataFrame({'a': [[1, 2], None, [3]]})
dump('c5_dropna_true', pb.puffy_to_long(f5, 'a', dropna=True))

# c7 — dict of dicts → two key levels
f7 = pd.DataFrame({'b': [{'k1': {'x': 1, 'y': 2}, 'k2': {'x': 3}},
                         {'k3': {'z': 4}}]})
dump('c7_deep_dict', pb.puffy_to_long(f7, 'b'))

# c6 — nested DataFrame cells via expand_cols
cell1 = pd.DataFrame({'c1': [1, 2], 'c2': [5, 6]})
cell2 = pd.DataFrame({'c1': [3], 'c2': [7]})
f6 = pd.DataFrame({'e': [cell1, cell2]})
dump('c6_expand', pb.puffy_to_long(f6, 'e', expand_cols=['e']))

# c8 — nested DataFrame cells through the default stack path
dump('c8_nested_frame', pb.puffy_to_long(f6, 'e'))

# c9 — 3-D ndarray: three positional levels within default max_depth=3
f9 = pd.DataFrame({'t': [np.arange(8.).reshape(2, 2, 2)]})
dump('c9_3d', pb.puffy_to_long(f9, 't'))

# c11 — ragged dict-of-lists (per-key list lengths differ)
f11 = pd.DataFrame({'b': [{'p': [1, 2, 3], 'q': [9]},
                          {'q': [7, 8]}]})
dump('c11_ragged_dict', pb.puffy_to_long(f11, 'b'))

# c12 — F2-composite shape: two 2-D arrays with a shared inner axis plus
# a nested-frame column through expand_cols, all in one to_long
cells = [pd.DataFrame({'c1': [1, 2], 'c2': [5, 6]}),
         pd.DataFrame({'c1': [3], 'c2': [7]})]
f12 = pd.DataFrame({
    'b': [np.array([[1., 2.], [3., 4.]]), np.array([[5., 6.], [7., 8.]])],
    'd': [np.array([[10., 20.], [30., 40.], [50., 60.]]),
          np.array([[70., 80.]])],
    'e': cells,
})
dump('c12_composite', pb.puffy_to_long(
    f12, 'b', 'd', 'e', expand_cols=['e'],
    aligned_axis={'b': 1, 'd': 1}))

# c14 — empty-list cell with dropna=True vanishes entirely
f14 = pd.DataFrame({'a': [[1], [], [2, 3]]})
dump('c14_empty_cell', pb.puffy_to_long(f14, 'a'))

# c15 — two-level row key (MultiIndex): merge keys include both
f15 = pd.DataFrame({
    'i1': ['g1', 'g1', 'g2'], 'i2': [0, 1, 0],
    'a': [[1, 2], [3], [4, 5]],
    'b': [['p'], ['q', 'r'], ['s']],
}).set_index(['i1', 'i2'])
dump('c15_multikey', pb.puffy_to_long(f15))

# c16 — expand_cols under a two-level key → ordinal named level_2
cells16 = [pd.DataFrame({'c1': [1, 2]}), pd.DataFrame({'c1': [3]})]
f16 = pd.DataFrame({'i1': ['g1', 'g2'], 'i2': [0, 1],
                    'e': cells16}).set_index(['i1', 'i2'])
dump('c16_multikey_expand', pb.puffy_to_long(f16, 'e', expand_cols=['e']))

# (to_puffy can't run differentially: the reference's group helper uses a
# pandas to_dict(into=...) signature incompatible with modern pandas —
# covered instead by the to_puffy oracle queries and round-trip
# property tests.)

# c17 — ragged nested-table cells: mismatched index nlevels make the
# aligned concat raise (AssertionError: "Cannot concat indices that do
# not have the same number of levels"); handle_diff flattens/stringifies
# each cell (reset_index: index levels -> columns, an unnamed RangeIndex
# -> a column named "index") and retries with a fresh ordinal level.
e17a = pd.DataFrame({'c1': [1, 2], 'c2': [5, 6]},
                    index=pd.MultiIndex.from_arrays(
                        [['a', 'b'], ['x', 'y']], names=['i', 'j']))
e17b = pd.DataFrame({'c1': [3], 'c3': [9]})
f17 = pd.DataFrame({'e': [e17a, e17b]})
dump('c17_ragged_expand', pb.FrameEngine(f17).expand_col('e'))

# c18 — keyless frame: the RangeIndex promotion gives a dense 0..n-1
# index_level0 (frame.py:188-194)
f18 = pd.DataFrame({'a': [[1, 2], [3, 4, 5]]})
dump('c18_dense_keyless', pb.puffy_to_long(f18, 'a'))

# c19 — named-MultiIndex cells: index names become columns, no ordinal
# (tutorial cell 21 shape)
e19a = pd.DataFrame({'c1': [1, 2], 'c2': [5, 6]},
                    index=pd.MultiIndex.from_arrays(
                        [['a', 'b'], ['x', 'y']], names=['i', 'j']))
e19b = pd.DataFrame({'c1': [3], 'c2': [7]},
                    index=pd.MultiIndex.from_arrays(
                        [['c'], ['z']], names=['i', 'j']))
f19 = pd.DataFrame({'e': [e19a, e19b]})
dump('c19_multiindex_expand', pb.FrameEngine(f19).expand_col('e'))

# c20 — tutorial cell 23: a cell index field named like a simultaneously
# exploded datacol gets the merge suffix (a -> a_e)
f20 = pd.DataFrame({
    'a': [['u', 'v'], ['w']],
    'e': [pd.DataFrame({'c1': [1, 2]}, index=pd.Index(['p', 'q'], name='a')),
          pd.DataFrame({'c1': [3]}, index=pd.Index(['r'], name='a'))]})
dump('c20_expand_collision', pb.puffy_to_long(f20, 'a', 'e', expand_cols=['e']))
