"""Batch file discovery/filter/stage + POSCAR ingest (sources/files.py)
vs the reference BatchFile semantics (tools/imports.py:206-344).
"""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray

from featurebox_ray.sources.files import (discover_files, filter_files,
                                          parse_poscar_text,
                                          read_poscar_fn, stage_files)

POSCAR = """test doc
1.25
2.0 0.0 0.0
0.5 3.0 0.0
0.0 0.0 1.5
Si O
2 1
Direct
0.0 0.25 0.5
0.0625 0.25 0.5
0.125 0.25 0.5
"""


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("filetree"))
    for g in ("g0", "g1", "band_line"):
        for s in ("s0", "s1"):
            d = f"{root}/{g}/{s}"
            os.makedirs(d)
            with open(f"{d}/POSCAR", "w") as fh:
                fh.write(POSCAR)
            with open(f"{d}/INCAR", "w") as fh:
                fh.write("ENCUT = 500\n")
            with open(f"{d}/notes.txt", "w") as fh:
                fh.write("x")
    with open(f"{root}/toplevel.txt", "w") as fh:
        fh.write("t")
    return root


def test_discover_counts_and_suffix(tree):
    assert discover_files(tree).count() == 19       # 6*3 + 1 top-level
    assert discover_files(tree, suffix="txt").count() == 7
    assert discover_files(tree, suffix="").count() == 12  # extension-less


def test_filter_name_and_dir_layers(tree):
    ds = discover_files(tree)
    # include+exclude on name (reference filter_file_name combined mode)
    both = filter_files(ds, name_include="CAR", name_exclude="IN")
    assert both.count() == 6                         # POSCARs only
    # dir filter at layer -2 (the group dir), reference filter_dir_name
    f = filter_files(ds, name_include="POSCAR", dir_exclude="band_line",
                     layer=-2)
    assert f.count() == 4
    # layer list joins segments
    f2 = filter_files(ds, name_include="POSCAR", dir_include="g0s1",
                      layer=[-2, -1])
    assert f2.count() == 1
    # top-level file (empty dirs) never matches a dir_include
    f3 = filter_files(ds, dir_include="s0", layer=-1)
    df3 = f3.to_pandas()
    assert len(df3) == 9                             # 3 groups x 3 files
    assert "toplevel.txt" not in set(df3["name"])


def test_stage_files_flatten_and_collision(tree, tmp_path):
    ds = filter_files(discover_files(tree), name_include="POSCAR",
                      dir_exclude="band_line", layer=-2)
    out = str(tmp_path / "staged")
    staged = stage_files(ds, out, flatten=True, add_dir=(-2, -1))
    assert staged.count() == 4
    assert sorted(os.listdir(out)) == [
        "g0_s0_POSCAR", "g0_s1_POSCAR", "g1_s0_POSCAR", "g1_s1_POSCAR"]
    # collision: flattening on the last dir only -> s0/s1 repeat per group
    with pytest.raises(Exception, match="collision"):
        stage_files(ds, str(tmp_path / "clash"), flatten=True,
                    add_dir=(-1,)).count()


def test_stage_files_tree_mode(tree, tmp_path):
    ds = filter_files(discover_files(tree), name_include="INCAR")
    out = str(tmp_path / "treecopy")
    stage_files(ds, out, flatten=False, add_dir=(-2, -1)).count()
    assert os.path.exists(f"{out}/g0/s0/INCAR")
    assert os.path.exists(f"{out}/band_line/s1/INCAR")


def test_parse_poscar_exact():
    rec = parse_poscar_text(POSCAR)
    assert rec["comment"] == "test doc"
    assert rec["scale"] == 1.25
    assert rec["species"] == ["Si", "O"]
    assert rec["counts"] == [2, 1]
    assert rec["n_atoms"] == 3
    assert not rec["cartesian"]
    # volume: 1.25^3 * det([[2,0,0],[.5,3,0],[0,0,1.5]]) = 1.953125 * 9
    assert rec["volume"] == 17.578125
    assert rec["coords"][1] == (0.0625, 0.25, 0.5)


def test_read_poscar_fn_batch(tree):
    ds = filter_files(discover_files(tree), name_include="POSCAR",
                      dir_include="g0", layer=-2)
    got = ds.map_batches(read_poscar_fn,
                         batch_format="pyarrow").to_pandas()
    assert len(got) == 2
    assert (got["volume"] == 17.578125).all()
    assert (got["x_sum"] == 0.1875).all()
    assert (got["n_atoms"] == 3).all()
