"""Symbolic expression layer: Variable/Expression/Polynomial/Formula.

Re-derivation of the reference's computer-algebra layer
(common/symbolic/expression.h, polynomial.h, monomial.h, decompose.h,
codegen.h) in a TPU-first shape.  The reference uses symbolic::Expression as
a third scalar type threaded through every System<T>; here JAX tracing
already covers the *numeric* roles (autodiff, linearization), so this layer
serves the jobs tracing cannot:

  - declarative program construction (MathematicalProgram costs/constraints
    written as expressions over Variables, then decomposed into A, b, Q),
  - structural analysis (is this affine? polynomial? extract coefficients),
  - SymbolicVectorSystem (systems/primitives/symbolic_vector_system.h),
  - codegen (common/symbolic/codegen.h): compile an expression tree into a
    jittable JAX function — XLA is the code generator.

Design: expressions are hash-consed immutable trees with Drake's flattened
canonical forms — Add is (constant + sum coeff_i * term_i), Mul is
(coeff * prod base_i ** pow_i) — which makes Expand/Polynomial extraction
and affine decomposition exact structural operations rather than numeric
probes (reference expression_cell.h ExpressionAdd/ExpressionMul).
"""

from __future__ import annotations

import itertools
import math
from typing import Callable, Dict, Iterable, List, Mapping, Sequence, Tuple

import numpy as np

_next_id = itertools.count()

# Node kinds.
_CONST = "const"
_VAR = "var"
_ADD = "add"  # payload: (c0, ((term, coeff), ...)) terms sorted by key
_MUL = "mul"  # payload: (c0, ((base, power), ...)) bases sorted by key
_POW = "pow"  # payload: (base_expr, exponent_expr)  (non-constant exponent)
_UNARY = (
    "sin", "cos", "tan", "asin", "acos", "atan", "sinh", "cosh", "tanh",
    "exp", "log", "sqrt", "abs", "floor", "ceil",
)
_ATAN2 = "atan2"
_MINMAX = ("min", "max")
_IF = "if_then_else"  # payload: (Formula, then_expr, else_expr)

_NUMPY_UNARY = {
    "sin": np.sin, "cos": np.cos, "tan": np.tan, "asin": np.arcsin,
    "acos": np.arccos, "atan": np.arctan, "sinh": np.sinh, "cosh": np.cosh,
    "tanh": np.tanh, "exp": np.exp, "log": np.log, "sqrt": np.sqrt,
    "abs": np.abs, "floor": np.floor, "ceil": np.ceil,
}


class Variable:
    """A named real-valued symbolic variable (common/symbolic/variable.h)."""

    __slots__ = ("name", "id")

    def __init__(self, name: str):
        self.name = name
        self.id = next(_next_id)

    def __repr__(self):
        return self.name

    def __hash__(self):
        return hash(("Variable", self.id))

    def __eq__(self, other):
        if isinstance(other, Variable):
            return self.id == other.id
        return NotImplemented

    # Arithmetic promotes to Expression.
    def _e(self) -> "Expression":
        return Expression._var(self)

    def __add__(self, o): return self._e() + o
    def __radd__(self, o): return o + self._e()
    def __sub__(self, o): return self._e() - o
    def __rsub__(self, o): return o - self._e()
    def __mul__(self, o): return self._e() * o
    def __rmul__(self, o): return o * self._e()
    def __truediv__(self, o): return self._e() / o
    def __rtruediv__(self, o): return o / self._e()
    def __pow__(self, o): return self._e() ** o
    def __rpow__(self, o): return to_expression(o) ** self._e()
    def __neg__(self): return -self._e()
    def __pos__(self): return self._e()
    def __lt__(self, o): return self._e() < o
    def __le__(self, o): return self._e() <= o
    def __gt__(self, o): return self._e() > o
    def __ge__(self, o): return self._e() >= o


def to_expression(v) -> "Expression":
    if isinstance(v, Expression):
        return v
    if isinstance(v, Variable):
        return Expression._var(v)
    if isinstance(v, (int, float, np.integer, np.floating)):
        return Expression._const(float(v))
    raise TypeError(f"cannot convert {type(v)} to Expression")


class Expression:
    """Immutable symbolic expression (common/symbolic/expression.h)."""

    __slots__ = ("kind", "payload", "_hash", "_vars")

    def __init__(self, kind, payload):
        self.kind = kind
        self.payload = payload
        self._hash = None
        self._vars = None

    # ---- constructors -------------------------------------------------
    @staticmethod
    def _const(c: float) -> "Expression":
        return Expression(_CONST, float(c))

    @staticmethod
    def _var(v: Variable) -> "Expression":
        return Expression(_VAR, v)

    @staticmethod
    def _add(c0: float, terms: Dict["Expression", float]) -> "Expression":
        terms = {t: c for t, c in terms.items() if c != 0.0}
        if not terms:
            return Expression._const(c0)
        if c0 == 0.0 and len(terms) == 1:
            (t, c), = terms.items()
            if c == 1.0:
                return t
        items = tuple(sorted(terms.items(), key=lambda tc: tc[0]._key()))
        return Expression(_ADD, (float(c0), items))

    @staticmethod
    def _mul(c0: float, bases: Dict["Expression", float]) -> "Expression":
        bases = {b: p for b, p in bases.items() if p != 0.0}
        if c0 == 0.0:
            return Expression._const(0.0)
        if not bases:
            return Expression._const(c0)
        if c0 == 1.0 and len(bases) == 1:
            (b, p), = bases.items()
            if p == 1.0:
                return b
        items = tuple(sorted(bases.items(), key=lambda bp: bp[0]._key()))
        return Expression(_MUL, (float(c0), items))

    def _key(self):
        return (self.kind, repr(self))

    # ---- structure ----------------------------------------------------
    def variables(self) -> frozenset:
        if self._vars is not None:
            return self._vars
        k = self.kind
        if k == _CONST:
            out = frozenset()
        elif k == _VAR:
            out = frozenset([self.payload])
        elif k == _ADD:
            out = frozenset().union(*[t.variables() for t, _ in self.payload[1]])
        elif k == _MUL:
            out = frozenset().union(*[b.variables() for b, _ in self.payload[1]])
        elif k == _IF:
            f, a, b = self.payload
            out = f.variables() | a.variables() | b.variables()
        elif k in (_POW, _ATAN2) or k in _MINMAX:
            out = self.payload[0].variables() | self.payload[1].variables()
        else:
            out = self.payload.variables()
        self._vars = out
        return out

    def is_constant(self) -> bool:
        return self.kind == _CONST

    def __hash__(self):
        if self._hash is None:
            self._hash = hash((self.kind, repr(self)))
        return self._hash

    def equal_to(self, other) -> bool:
        other = to_expression(other)
        return self.kind == other.kind and repr(self) == repr(other)

    # Structural equality (Expression::EqualTo). NOTE deviation from the
    # reference, where == builds a Formula: Python dict/set canonicalization
    # (the Add/Mul coefficient maps) requires bool __eq__; use EqualTo()
    # to build an equality Formula.
    def __eq__(self, other):
        if isinstance(other, (Expression, Variable, int, float)):
            return self.equal_to(other)
        return NotImplemented

    def __ne__(self, other):
        eq = self.__eq__(other)
        return NotImplemented if eq is NotImplemented else not eq

    def __repr__(self):
        k = self.kind
        if k == _CONST:
            return repr(self.payload)
        if k == _VAR:
            return self.payload.name
        if k == _ADD:
            c0, items = self.payload
            parts = ([repr(c0)] if c0 != 0.0 else []) + [
                (f"{c} * {t!r}" if c != 1.0 else repr(t)) for t, c in items
            ]
            return "(" + " + ".join(parts) + ")"
        if k == _MUL:
            c0, items = self.payload
            parts = ([repr(c0)] if c0 != 1.0 else []) + [
                (f"{b!r}^{p}" if p != 1.0 else repr(b)) for b, p in items
            ]
            return "(" + " * ".join(parts) + ")"
        if k == _POW:
            return f"pow({self.payload[0]!r}, {self.payload[1]!r})"
        if k == _IF:
            f, a, b = self.payload
            return f"(if {f!r} then {a!r} else {b!r})"
        if k in (_ATAN2,) or k in _MINMAX:
            return f"{k}({self.payload[0]!r}, {self.payload[1]!r})"
        return f"{k}({self.payload!r})"

    # ---- arithmetic (canonicalizing) -----------------------------------
    def __add__(self, other):
        other = to_expression(other)
        c0, terms = 0.0, {}

        def absorb(e, sign):
            nonlocal c0
            if e.kind == _CONST:
                c0 += sign * e.payload
            elif e.kind == _ADD:
                ec0, items = e.payload
                c0 += sign * ec0
                for t, c in items:
                    terms[t] = terms.get(t, 0.0) + sign * c
            elif e.kind == _MUL and e.payload[0] != 1.0:
                ec0, items = e.payload
                t = Expression._mul(1.0, dict(items))
                terms[t] = terms.get(t, 0.0) + sign * ec0
            else:
                terms[e] = terms.get(e, 0.0) + sign

        absorb(self, 1.0)
        absorb(other, 1.0)
        return Expression._add(c0, terms)

    def __radd__(self, other):
        return to_expression(other) + self

    def __sub__(self, other):
        return self + (-to_expression(other))

    def __rsub__(self, other):
        return to_expression(other) + (-self)

    def __neg__(self):
        return self * -1.0

    def __pos__(self):
        return self

    def __mul__(self, other):
        other = to_expression(other)
        # constant * ADD distributes (keeps sums canonical: without this,
        # -1.0 * (c0 + sum c_i t_i) becomes an opaque MUL base and every
        # later Expand/Polynomial pass sees a non-canonical term)
        if self.kind == _CONST and other.kind == _ADD:
            k = self.payload
            oc0, items = other.payload
            return Expression._add(
                k * oc0, {t: k * c for t, c in items}
            )
        if other.kind == _CONST and self.kind == _ADD:
            k = other.payload
            sc0, items = self.payload
            return Expression._add(
                k * sc0, {t: k * c for t, c in items}
            )
        c0, bases = 1.0, {}

        def absorb(e):
            nonlocal c0
            if e.kind == _CONST:
                c0 *= e.payload
            elif e.kind == _MUL:
                ec0, items = e.payload
                c0 *= ec0
                for b, p in items:
                    bases[b] = bases.get(b, 0.0) + p
            else:
                bases[e] = bases.get(e, 0.0) + 1.0

        absorb(self)
        absorb(other)
        return Expression._mul(c0, bases)

    def __rmul__(self, other):
        return to_expression(other) * self

    def __truediv__(self, other):
        other = to_expression(other)
        if other.kind == _CONST:
            if other.payload == 0.0:
                raise ZeroDivisionError("symbolic division by zero")
            return self * (1.0 / other.payload)
        return self * (other ** -1.0)

    def __rtruediv__(self, other):
        return to_expression(other) / self

    def __pow__(self, other):
        other = to_expression(other)
        if other.kind == _CONST:
            p = other.payload
            if self.kind == _CONST:
                return Expression._const(self.payload ** p)
            if p == 0.0:
                return Expression._const(1.0)
            if p == 1.0:
                return self
            if self.kind == _MUL:
                c0, items = self.payload
                if c0 > 0.0 or p == round(p):
                    return Expression._mul(
                        c0 ** p, {b: bp * p for b, bp in items}
                    )
            return Expression._mul(1.0, {self: p})
        return Expression(_POW, (self, other))

    # ---- comparisons -> Formula ----------------------------------------
    def __lt__(self, o): return Formula("<", self, to_expression(o))
    def __le__(self, o): return Formula("<=", self, to_expression(o))
    def __gt__(self, o): return Formula(">", self, to_expression(o))
    def __ge__(self, o): return Formula(">=", self, to_expression(o))

    def EqualTo(self, o) -> "Formula":
        return Formula("==", self, to_expression(o))

    # ---- evaluation / substitution / differentiation --------------------
    def Evaluate(self, env: Mapping[Variable, float]) -> float:
        return _eval(self, env, np)

    def Substitute(self, subst: Mapping[Variable, object]) -> "Expression":
        table = {v: to_expression(e) for v, e in subst.items()}
        return _substitute(self, table, {})

    def Differentiate(self, x: Variable) -> "Expression":
        return _diff(self, x, {})

    def Jacobian(self, vars: Sequence[Variable]) -> List["Expression"]:
        return [self.Differentiate(v) for v in vars]

    def Expand(self) -> "Expression":
        return _expand(self, {})

    def is_polynomial(self) -> bool:
        k = self.kind
        if k in (_CONST, _VAR):
            return True
        if k == _ADD:
            return all(t.is_polynomial() for t, _ in self.payload[1])
        if k == _MUL:
            return all(
                b.is_polynomial() and p == round(p) and p >= 0
                for b, p in self.payload[1]
            )
        return False


class Formula:
    """A relational formula lhs <op> rhs (common/symbolic/formula.h)."""

    __slots__ = ("op", "lhs", "rhs")

    def __init__(self, op: str, lhs: Expression, rhs: Expression):
        self.op = op
        self.lhs = lhs
        self.rhs = rhs

    def variables(self) -> frozenset:
        return self.lhs.variables() | self.rhs.variables()

    def Evaluate(self, env: Mapping[Variable, float]) -> bool:
        a, b = self.lhs.Evaluate(env), self.rhs.Evaluate(env)
        return bool(
            {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b,
             "==": a == b, "!=": a != b}[self.op]
        )

    def __repr__(self):
        return f"({self.lhs!r} {self.op} {self.rhs!r})"


def if_then_else(f: Formula, e_then, e_else) -> Expression:
    return Expression(_IF, (f, to_expression(e_then), to_expression(e_else)))


# ---- math functions -----------------------------------------------------
def _unary(kind):
    def fn(e):
        e = to_expression(e)
        if e.kind == _CONST:
            return Expression._const(float(_NUMPY_UNARY[kind](e.payload)))
        return Expression(kind, e)
    fn.__name__ = kind
    return fn


sin = _unary("sin"); cos = _unary("cos"); tan = _unary("tan")
asin = _unary("asin"); acos = _unary("acos"); atan = _unary("atan")
sinh = _unary("sinh"); cosh = _unary("cosh"); tanh = _unary("tanh")
exp = _unary("exp"); log = _unary("log"); abs_ = _unary("abs")
floor = _unary("floor"); ceil = _unary("ceil")


def sqrt(e):
    e = to_expression(e)
    if e.kind == _CONST:
        return Expression._const(math.sqrt(e.payload))
    return e ** 0.5


def atan2(y, x):
    y, x = to_expression(y), to_expression(x)
    if y.kind == _CONST and x.kind == _CONST:
        return Expression._const(math.atan2(y.payload, x.payload))
    return Expression(_ATAN2, (y, x))


def minimum(a, b):
    a, b = to_expression(a), to_expression(b)
    if a.kind == _CONST and b.kind == _CONST:
        return Expression._const(min(a.payload, b.payload))
    return Expression("min", (a, b))


def maximum(a, b):
    a, b = to_expression(a), to_expression(b)
    if a.kind == _CONST and b.kind == _CONST:
        return Expression._const(max(a.payload, b.payload))
    return Expression("max", (a, b))


def pow_(b, e):
    return to_expression(b) ** e


# ---- internals -----------------------------------------------------------
def _eval(e: Expression, env, xp):
    k = e.kind
    if k == _CONST:
        return e.payload
    if k == _VAR:
        try:
            return env[e.payload]
        except KeyError:
            raise KeyError(f"no value for variable {e.payload!r}") from None
    if k == _ADD:
        c0, items = e.payload
        return c0 + sum(c * _eval(t, env, xp) for t, c in items)
    if k == _MUL:
        c0, items = e.payload
        out = c0
        for b, p in items:
            out = out * _eval(b, env, xp) ** p
        return out
    if k == _POW:
        return _eval(e.payload[0], env, xp) ** _eval(e.payload[1], env, xp)
    if k == _ATAN2:
        return xp.arctan2(_eval(e.payload[0], env, xp),
                          _eval(e.payload[1], env, xp))
    if k == "min":
        return xp.minimum(_eval(e.payload[0], env, xp),
                          _eval(e.payload[1], env, xp))
    if k == "max":
        return xp.maximum(_eval(e.payload[0], env, xp),
                          _eval(e.payload[1], env, xp))
    if k == _IF:
        f, a, b = e.payload
        return _eval(a, env, xp) if f.Evaluate(env) else _eval(b, env, xp)
    return _NUMPY_UNARY[k](_eval(e.payload, env, xp))


def _substitute(e: Expression, table, memo):
    if e in memo:
        return memo[e]
    k = e.kind
    if k == _CONST:
        out = e
    elif k == _VAR:
        out = table.get(e.payload, e)
    elif k == _ADD:
        c0, items = e.payload
        out = to_expression(c0)
        for t, c in items:
            out = out + c * _substitute(t, table, memo)
    elif k == _MUL:
        c0, items = e.payload
        out = to_expression(c0)
        for b, p in items:
            out = out * _substitute(b, table, memo) ** p
    elif k == _POW:
        out = _substitute(e.payload[0], table, memo) ** _substitute(
            e.payload[1], table, memo)
    elif k == _ATAN2:
        out = atan2(_substitute(e.payload[0], table, memo),
                    _substitute(e.payload[1], table, memo))
    elif k in _MINMAX:
        f = minimum if k == "min" else maximum
        out = f(_substitute(e.payload[0], table, memo),
                _substitute(e.payload[1], table, memo))
    elif k == _IF:
        f, a, b = e.payload
        nf = Formula(f.op, _substitute(f.lhs, table, memo),
                     _substitute(f.rhs, table, memo))
        out = if_then_else(nf, _substitute(a, table, memo),
                           _substitute(b, table, memo))
    else:
        out = globals()[k if k != "abs" else "abs_"](
            _substitute(e.payload, table, memo))
    memo[e] = out
    return out


def _diff(e: Expression, x: Variable, memo):
    key = e
    if key in memo:
        return memo[key]
    k = e.kind
    zero = Expression._const(0.0)
    if k == _CONST:
        out = zero
    elif k == _VAR:
        out = Expression._const(1.0 if e.payload == x else 0.0)
    elif k == _ADD:
        _, items = e.payload
        out = zero
        for t, c in items:
            out = out + c * _diff(t, x, memo)
    elif k == _MUL:
        c0, items = e.payload
        out = zero
        for i, (b, p) in enumerate(items):
            db = _diff(b, x, memo)
            if db.kind == _CONST and db.payload == 0.0:
                continue
            rest = Expression._mul(
                c0, {bb: (pp - 1.0 if j == i else pp)
                     for j, (bb, pp) in enumerate(items)})
            out = out + p * rest * db
    elif k == _POW:
        b, p = e.payload
        out = e * (_diff(p, x, memo) * log(b) + p * _diff(b, x, memo) / b)
    elif k == _ATAN2:
        y, xx = e.payload
        denom = y * y + xx * xx
        out = (xx * _diff(y, x, memo) - y * _diff(xx, x, memo)) / denom
    elif k in _MINMAX:
        raise ValueError(f"{k} is not differentiable symbolically")
    elif k == _IF:
        f, a, b = e.payload
        out = if_then_else(f, _diff(a, x, memo), _diff(b, x, memo))
    else:
        u = e.payload
        du = _diff(u, x, memo)
        table = {
            "sin": lambda: cos(u), "cos": lambda: -sin(u),
            "tan": lambda: 1.0 + tan(u) * tan(u),
            "asin": lambda: (1.0 - u * u) ** -0.5,
            "acos": lambda: -((1.0 - u * u) ** -0.5),
            "atan": lambda: 1.0 / (1.0 + u * u),
            "sinh": lambda: cosh(u), "cosh": lambda: sinh(u),
            "tanh": lambda: 1.0 - tanh(u) * tanh(u),
            "exp": lambda: exp(u), "log": lambda: 1.0 / u,
            "sqrt": lambda: 0.5 * u ** -0.5,
        }
        if k not in table:
            raise ValueError(f"{k} is not differentiable symbolically")
        out = table[k]() * du
    memo[key] = out
    return out


def _expand(e: Expression, memo):
    if e in memo:
        return memo[e]
    k = e.kind
    if k in (_CONST, _VAR):
        out = e
    elif k == _ADD:
        c0, items = e.payload
        out = to_expression(c0)
        for t, c in items:
            out = out + c * _expand(t, memo)
    elif k == _MUL:
        c0, items = e.payload
        # Expand integer powers of sums by repeated distribution.
        factors = [to_expression(c0)]
        for b, p in items:
            be = _expand(b, memo)
            if p == round(p) and p > 0 and be.kind == _ADD:
                factors.extend([be] * int(p))
            else:
                factors.append(be ** p)
        out = factors[0]
        for f in factors[1:]:
            out = _distribute(out, f)
        out = out
    else:
        out = e
    memo[e] = out
    return out


def _distribute(a: Expression, b: Expression) -> Expression:
    a_terms = _as_terms(a)
    b_terms = _as_terms(b)
    out = Expression._const(0.0)
    for ta in a_terms:
        for tb in b_terms:
            out = out + ta * tb
    return out


def _as_terms(e: Expression) -> List[Expression]:
    if e.kind == _ADD:
        c0, items = e.payload
        out = [Expression._const(c0)] if c0 != 0.0 else []
        out.extend(c * t for t, c in items)
        return out
    return [e]


# ---- Polynomial (common/symbolic/polynomial.h) ----------------------------
class Monomial:
    """A power product of variables (common/symbolic/monomial.h)."""

    __slots__ = ("powers",)

    def __init__(self, powers: Mapping[Variable, int] = ()):
        self.powers = tuple(sorted(
            ((v, int(p)) for v, p in dict(powers).items() if p != 0),
            key=lambda vp: vp[0].id))

    def degree(self) -> int:
        return sum(p for _, p in self.powers)

    def ToExpression(self) -> Expression:
        out = Expression._const(1.0)
        for v, p in self.powers:
            out = out * to_expression(v) ** p
        return out

    def __mul__(self, other: "Monomial") -> "Monomial":
        d = dict(self.powers)
        for v, p in other.powers:
            d[v] = d.get(v, 0) + p
        return Monomial(d)

    def __hash__(self):
        return hash(self.powers)

    def __eq__(self, other):
        return isinstance(other, Monomial) and self.powers == other.powers

    def __repr__(self):
        if not self.powers:
            return "1"
        return "*".join(
            f"{v.name}^{p}" if p != 1 else v.name for v, p in self.powers)


class Polynomial:
    """Sparse monomial->coefficient map over `indeterminates`."""

    def __init__(self, arg=0.0, indeterminates: Sequence[Variable] = None):
        if isinstance(arg, dict):
            self.terms = {m: float(c) for m, c in arg.items() if c != 0.0}
            return
        e = to_expression(arg).Expand()
        inds = (frozenset(indeterminates) if indeterminates is not None
                else e.variables())
        self.terms: Dict[Monomial, float] = {}
        for term in _as_terms(e):
            m, c = _to_monomial(term, inds)
            self.terms[m] = self.terms.get(m, 0.0) + c
        self.terms = {m: c for m, c in self.terms.items() if c != 0.0}

    def TotalDegree(self) -> int:
        return max((m.degree() for m in self.terms), default=0)

    def monomial_to_coefficient_map(self) -> Dict[Monomial, float]:
        return dict(self.terms)

    def ToExpression(self) -> Expression:
        out = Expression._const(0.0)
        for m, c in self.terms.items():
            out = out + c * m.ToExpression()
        return out

    def __add__(self, other):
        other = other if isinstance(other, Polynomial) else Polynomial(other)
        d = dict(self.terms)
        for m, c in other.terms.items():
            d[m] = d.get(m, 0.0) + c
        return Polynomial(d)

    def __mul__(self, other):
        other = other if isinstance(other, Polynomial) else Polynomial(other)
        d: Dict[Monomial, float] = {}
        for ma, ca in self.terms.items():
            for mb, cb in other.terms.items():
                m = ma * mb
                d[m] = d.get(m, 0.0) + ca * cb
        return Polynomial(d)

    def Differentiate(self, x: Variable) -> "Polynomial":
        d: Dict[Monomial, float] = {}
        for m, c in self.terms.items():
            pw = dict(m.powers)
            p = pw.get(x, 0)
            if p == 0:
                continue
            pw[x] = p - 1
            dm = Monomial(pw)
            d[dm] = d.get(dm, 0.0) + c * p
        return Polynomial(d)

    def Evaluate(self, env: Mapping[Variable, float]) -> float:
        out = 0.0
        for m, c in self.terms.items():
            val = c
            for v, p in m.powers:
                val *= env[v] ** p
            out += val
        return out

    def __repr__(self):
        return " + ".join(f"{c}*{m!r}" for m, c in self.terms.items()) or "0"


def _to_monomial(term: Expression, inds) -> Tuple[Monomial, float]:
    if term.kind == _CONST:
        return Monomial(), term.payload
    if term.kind == _VAR:
        return Monomial({term.payload: 1}), 1.0
    if term.kind == _MUL:
        c0, items = term.payload
        powers = {}
        for b, p in items:
            if b.kind == _MUL and p == round(p) and p >= 1:
                # nested product (e.g. -1.0 * (-1.0 * s) from an unexpanded
                # constant-times-term): fold it in recursively
                m_in, c_in = _to_monomial(b, inds)
                for v, pw in m_in.powers:
                    powers[v] = powers.get(v, 0) + pw * int(p)
                c0 = c0 * (c_in ** int(p))
                continue
            if b.kind != _VAR or p != round(p) or p < 0:
                raise ValueError(f"not a polynomial term: {term!r}")
            if b.payload in inds:
                powers[b.payload] = powers.get(b.payload, 0) + int(p)
            else:
                raise ValueError(
                    f"variable {b.payload!r} is not an indeterminate")
        return Monomial(powers), c0
    raise ValueError(f"not a polynomial term: {term!r}")


# ---- decompose (common/symbolic/decompose.h) -------------------------------
def decompose_linear_expressions(
    exprs: Sequence[Expression], vars: Sequence[Variable]
) -> np.ndarray:
    """exprs == A @ vars; raises if any expression is not linear."""
    A, b = decompose_affine_expressions(exprs, vars)
    if np.any(b != 0.0):
        raise ValueError("expressions are affine, not linear (b != 0)")
    return A


def decompose_affine_expressions(
    exprs: Sequence[Expression], vars: Sequence[Variable]
) -> Tuple[np.ndarray, np.ndarray]:
    """exprs == A @ vars + b; exact structural extraction."""
    vid = {v: i for i, v in enumerate(vars)}
    A = np.zeros((len(exprs), len(vars)))
    b = np.zeros(len(exprs))
    for i, e in enumerate(exprs):
        e = to_expression(e).Expand()
        for term in _as_terms(e):
            if term.kind == _CONST:
                b[i] += term.payload
            elif term.kind == _VAR:
                A[i, vid[term.payload]] += 1.0
            elif term.kind == _MUL:
                c0, items = term.payload
                if (len(items) != 1 or items[0][1] != 1.0
                        or items[0][0].kind != _VAR):
                    raise ValueError(f"non-affine term: {term!r}")
                A[i, vid[items[0][0].payload]] += c0
            else:
                raise ValueError(f"non-affine term: {term!r}")
    return A, b


def decompose_quadratic_polynomial(
    expr: Expression, vars: Sequence[Variable]
) -> Tuple[np.ndarray, np.ndarray, float]:
    """expr == 0.5 x'Qx + b'x + c (Q symmetric); exact extraction."""
    vid = {v: i for i, v in enumerate(vars)}
    n = len(vars)
    Q = np.zeros((n, n))
    b = np.zeros(n)
    c = 0.0
    for term in _as_terms(to_expression(expr).Expand()):
        if term.kind == _CONST:
            c += term.payload
            continue
        if term.kind == _VAR:
            b[vid[term.payload]] += 1.0
            continue
        if term.kind != _MUL:
            raise ValueError(f"non-quadratic term: {term!r}")
        c0, items = term.payload
        degs = []
        for base, p in items:
            if base.kind != _VAR or p != round(p):
                raise ValueError(f"non-quadratic term: {term!r}")
            degs.extend([vid[base.payload]] * int(p))
        if len(degs) == 1:
            b[degs[0]] += c0
        elif len(degs) == 2:
            i, j = degs
            Q[i, j] += c0
            Q[j, i] += c0
        else:
            raise ValueError(f"degree > 2 term: {term!r}")
    return Q, b, c


# ---- codegen (common/symbolic/codegen.h): compile to JAX -------------------
def to_jax(
    exprs, vars: Sequence[Variable]
) -> Callable:
    """Compile expression(s) into a jittable function f(x) with x[i] = vars[i].

    XLA is the code generator: the expression tree is evaluated once at trace
    time with jnp scalars (the reference emits C; we emit a jaxpr).
    """
    import jax.numpy as jnp

    single = isinstance(exprs, (Expression, Variable, int, float))
    elist = [to_expression(exprs)] if single else [to_expression(e) for e in exprs]

    def fn(x):
        env = {v: x[i] for i, v in enumerate(vars)}
        memo = {}

        def ev(e):
            if e in memo:
                return memo[e]
            k = e.kind
            if k == _CONST:
                out = e.payload
            elif k == _VAR:
                out = env[e.payload]
            elif k == _ADD:
                c0, items = e.payload
                out = c0
                for t, cc in items:
                    out = out + cc * ev(t)
            elif k == _MUL:
                c0, items = e.payload
                out = c0
                for bb, pp in items:
                    out = out * ev(bb) ** pp
            elif k == _POW:
                out = ev(e.payload[0]) ** ev(e.payload[1])
            elif k == _ATAN2:
                out = jnp.arctan2(ev(e.payload[0]), ev(e.payload[1]))
            elif k == "min":
                out = jnp.minimum(ev(e.payload[0]), ev(e.payload[1]))
            elif k == "max":
                out = jnp.maximum(ev(e.payload[0]), ev(e.payload[1]))
            elif k == _IF:
                f, a, bb = e.payload
                la, lb = ev(f.lhs), ev(f.rhs)
                pred = {"<": la < lb, "<=": la <= lb, ">": la > lb,
                        ">=": la >= lb, "==": la == lb, "!=": la != lb}[f.op]
                out = jnp.where(pred, ev(a), ev(bb))
            else:
                jfn = {"sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
                       "asin": jnp.arcsin, "acos": jnp.arccos,
                       "atan": jnp.arctan, "sinh": jnp.sinh,
                       "cosh": jnp.cosh, "tanh": jnp.tanh, "exp": jnp.exp,
                       "log": jnp.log, "sqrt": jnp.sqrt, "abs": jnp.abs,
                       "floor": jnp.floor, "ceil": jnp.ceil}[k]
                out = jfn(ev(e.payload))
            memo[e] = out
            return out

        outs = [ev(e) for e in elist]
        return outs[0] if single else jnp.stack(
            [jnp.asarray(o, x.dtype) * jnp.ones((), x.dtype) for o in outs])

    return fn


def MakeVectorVariable(n: int, name: str) -> List[Variable]:
    return [Variable(f"{name}({i})") for i in range(n)]


def Jacobian(exprs: Sequence[Expression], vars: Sequence[Variable]):
    """Matrix of partial derivatives (list of lists of Expression)."""
    return [[to_expression(e).Differentiate(v) for v in vars] for e in exprs]
