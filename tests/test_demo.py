"""The examples/demo.py walkthrough must keep running end-to-end."""

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"),
)


def test_demo_runs(spark, capsys):
    import demo

    demo.main(spark)
    out = capsys.readouterr().out
    assert "constrained generation" in out
    assert "canonicalized id triples" in out
    assert "<sub>" in out and "<rel>" in out
