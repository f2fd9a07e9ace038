"""The Point3D grid example must reproduce the reference golden output
(examples/main.rs:53-66, README.md:62-74)."""

import os
import runpy
import sys


def test_point3d_golden(capsys):
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        "point3d.py",
    )
    mod = runpy.run_path(path)
    dists = mod["main"]()
    assert dists.tolist() == [49, 50, 50, 50, 50, 51, 51, 51, 51, 53]
    out = capsys.readouterr().out
    assert "49 : Point3D(2, 4, 9)" in out
