"""Group-dispose ops + x_group packing + inner coefficient fitting —
parity with reference semantics:

* np_map() dispose functions (symbol/functions/npfunc.py:3-61): Flat/Comp
  sum/multiply the group axis, Diff/Quot act on 2-member groups only,
  Conv swaps a 2-member group's rows (ported cases from reference
  test/test_function.py:13-151 — elementwise broadcast of scalar ops over
  grouped arrays — and test_symbol_base.py grouped features).
* SymbolSet._group packing (symbol/base.py:461-480): int group size →
  consecutive chunks, singles dropped from groups, packed terminals
  appended after remaining singles.
* add_coefficient(inner_add=True) + least_squares
  (symbol/calculation/coefficient.py:171-260, 395-405): per-add-term
  W_i/k_i plus outer A/B, golden recovery of planted coefficients.
"""

import numpy as np
import pytest

from featurebox_ray.functions.expr import (
    DISPOSE, add_inner_coefficients, apply_expression, complexity, eval_expr,
    expr_to_str, fit_inner_coefficients, fit_score, pack_groups)

rng = np.random.default_rng(42)
N = 200


def _cols(k=6):
    return [rng.normal(size=N) + 2.0 for _ in range(k)]


# ---------------------------------------------------------------------------
# dispose semantics (reference np_map parity)
# ---------------------------------------------------------------------------


def test_dispose_ops_match_reference_npfunc():
    g2 = np.stack([rng.normal(size=N), rng.normal(size=N) + 3])
    g3 = np.stack([rng.normal(size=N) for _ in range(3)])
    assert np.allclose(DISPOSE["madd"](g2), g2[0] + g2[1])
    assert np.allclose(DISPOSE["madd"](g3), g3.sum(axis=0))
    assert np.allclose(DISPOSE["mmul"](g3), g3.prod(axis=0))
    assert np.allclose(DISPOSE["msub"](g2), g2[0] - g2[1])
    assert np.allclose(DISPOSE["mdiv"](g2), g2[0] / g2[1])
    assert np.allclose(DISPOSE["conv"](g2), np.stack([g2[1], g2[0]]))
    # reference: Diff/Quot/Conv are identity on groups of size != 2
    assert DISPOSE["msub"](g3) is g3
    assert DISPOSE["mdiv"](g3) is g3
    assert DISPOSE["conv"](g3) is g3
    # and identity on 1-D input
    v = rng.normal(size=N)
    for name in DISPOSE:
        assert DISPOSE[name](v) is v


def test_scalar_ops_broadcast_over_groups():
    """Reference NewArray semantics: a * arr3 maps elementwise over the
    group members (test_function.py test_mul/test_add/test_rsub)."""
    a, b, c, s = (rng.normal(size=N) for _ in range(4))
    cols = [np.stack([a, b, c]), s]
    out = eval_expr(("mul", ("x", 0), ("x", 1)), cols)
    assert out.shape == (3, N)
    assert np.allclose(out, np.stack([a * s, b * s, c * s]))
    out = eval_expr(("madd", ("mul", ("x", 0), ("x", 1))), cols)
    assert np.allclose(out, (a + b + c) * s)
    out = eval_expr(("sub", ("c", 1.5), ("x", 0)), cols)
    assert np.allclose(out, np.stack([1.5 - a, 1.5 - b, 1.5 - c]))


def test_group_expr_scoring_requires_dispose():
    a, b = rng.normal(size=N), rng.normal(size=N)
    cols = [np.stack([a, b])]
    y = a + b
    # undisposed 2-D output scores -inf, disposed scores 1.0
    assert fit_score(("x", 0), cols, y) == -np.inf
    assert fit_score(("madd", ("x", 0)), cols, y) == pytest.approx(1.0)
    assert fit_score(("msub", ("conv", ("x", 0))), cols, b - a) == \
        pytest.approx(1.0)


def test_pack_groups_int_and_explicit():
    cols = _cols(6)
    # reference x_group=[[1,2],[4,5]] -> singles x0,x3 then gx0,gx1
    packed, names = pack_groups(cols, [[1, 2], [4, 5]])
    assert names == ["x0", "x3", "gx0", "gx1"]
    assert packed[0] is cols[0] and packed[1] is cols[3]
    assert packed[2].shape == (2, N)
    assert np.allclose(packed[2], np.stack([cols[1], cols[2]]))
    # int form: chunks of 2 over all columns
    packed, names = pack_groups(cols, 2)
    assert names == ["gx0", "gx1", "gx2"]
    # short trailing chunk (< 2) stays single
    packed, names = pack_groups(cols[:5], 2)
    assert names == ["x4", "gx0", "gx1"]
    # groups of < 2 are dropped from x_group
    packed, names = pack_groups(cols, [[1], [2, 3]])
    assert names == ["x0", "x1", "x4", "x5", "gx0"]


def test_expr_str_and_complexity_with_groups():
    e = ("madd", ("mul", ("x", 0), ("x", 1)))
    assert expr_to_str(e, ["gx0", "p"]) == "madd((gx0 * p))"
    assert complexity(e) == 4


# ---------------------------------------------------------------------------
# inner coefficient fitting
# ---------------------------------------------------------------------------


def test_add_inner_coefficients_structure():
    e = ("add", ("mul", ("x", 0), ("x", 1)), ("ln", ("x", 2)))
    pe, nk = add_inner_coefficients(e)
    assert nk == 2
    assert pe[0] == "add" and pe[1][0] == "k" and pe[2][0] == "k"
    # nested add inside a nonlinear op also gets coefficients
    e2 = ("exp", ("add", ("x", 0), ("x", 1)))
    pe2, nk2 = add_inner_coefficients(e2)
    assert nk2 == 2


def test_inner_coefficients_recover_planted_linear_terms():
    cols = _cols(3)
    y = 2.3 * cols[0] * cols[1] + np.log(np.abs(cols[2]) + 1e-300) * 1.0 + 0.9
    e = ("add", ("mul", ("x", 0), ("x", 1)), ("ln", ("x", 2)))
    k, a, b, r2 = fit_inner_coefficients(e, cols, y)
    assert r2 > 1 - 1e-8
    # a*k0 = 2.3, a*k1 = 1.0 (scale split between a and k is free)
    assert a * k[0] == pytest.approx(2.3, rel=1e-4)
    assert a * k[1] == pytest.approx(1.0, rel=1e-4)
    assert b == pytest.approx(0.9, rel=1e-3)


def test_inner_coefficients_recover_nonlinear_inner_term():
    """2.3*x0*x1 + ln(0.7*x2): ln(0.7 x2) = ln(x2) + ln(0.7) folds into
    the intercept; and a genuinely nonlinear inner case exp(0.5 x0 + 1.5 x1)
    needs the Gauss-Newton loop (k inside exp is NOT linear)."""
    cols = _cols(3)
    x0, x1, x2 = cols
    y = 2.3 * x0 * x1 + np.log(0.7 * np.abs(x2) + 1e-300)
    e = ("add", ("mul", ("x", 0), ("x", 1)), ("ln", ("x", 2)))
    k, a, b, r2 = fit_inner_coefficients(e, cols, y)
    assert r2 > 1 - 1e-8
    assert b == pytest.approx(np.log(0.7), abs=1e-3)

    y2 = np.exp(0.5 * x0 + 0.25 * x1) * 3.0 + 1.0
    e2 = ("exp", ("add", ("x", 0), ("x", 1)))
    k2, a2, b2, r22 = fit_inner_coefficients(e2, cols, y2)
    assert r22 > 1 - 1e-6
    assert k2[0] == pytest.approx(0.5, abs=1e-3)
    assert k2[1] == pytest.approx(0.25, abs=1e-3)
    assert a2 == pytest.approx(3.0, rel=1e-3)
    assert b2 == pytest.approx(1.0, rel=1e-3)


def test_inner_coefficients_no_add_node_outer_only():
    cols = _cols(2)
    y = 4.0 * cols[0] * cols[1] - 2.0
    k, a, b, r2 = fit_inner_coefficients(("mul", ("x", 0), ("x", 1)), cols, y)
    assert len(k) == 0
    assert a == pytest.approx(4.0) and b == pytest.approx(-2.0)
    assert r2 == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# Dataset-level group expression (q38 path)
# ---------------------------------------------------------------------------


def test_apply_expression_with_group_columns():
    import ray

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_tax"])
    e = ("madd", ("mul", ("x", 0), ("x", 1)))
    out = apply_expression(
        ds, e, columns=[["l_quantity", "l_tax"], "l_discount"],
        out_col="gfeat").to_pandas()
    want = (out["l_quantity"] + out["l_tax"]) * out["l_discount"]
    assert np.allclose(out["gfeat"], want)
    # undisposed group output must raise
    with pytest.raises(Exception, match="DISPOSE|2-D"):
        apply_expression(ds, ("mul", ("x", 0), ("x", 1)),
                         columns=[["l_quantity", "l_tax"], "l_discount"],
                         out_col="bad").to_pandas()


def test_composition_parse_reference_semantics():
    """namespilt analog: name+count grammar, missing count = 1, repeats
    accumulate (Ele.__add__), unknown names land in the other bucket."""
    from featurebox_ray.stages.parse import (CompositionExpander,
                                             parse_composition)

    assert parse_composition("click3error12view5") == {
        "click": 3.0, "error": 12.0, "view": 5.0}
    assert parse_composition("click") == {"click": 1.0}
    assert parse_composition("click2click3") == {"click": 5.0}
    assert parse_composition("tool_a1.5tool_b2") == {
        "tool_a": 1.5, "tool_b": 2.0}
    assert parse_composition("") == {}

    import pyarrow as pa

    exp = CompositionExpander("s", ["click", "view"])
    out = exp(pa.table({"s": pa.array(["click3mystery7view2", None])}))
    assert out["comp_click"].to_pylist() == [3.0, 0.0]
    assert out["comp_view"].to_pylist() == [2.0, 0.0]
    assert out["comp_other"].to_pylist() == [7.0, 0.0]
