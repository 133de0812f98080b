"""Spark SQL bridge for catalog-stored Andl operators — the Spark
analog of plandl/AndlPg (reference: plandl/plandl.c:1,
AndlPg/MainPg.cs:1), which hosts Andl *inside* PostgreSQL as a
procedural-language handler so SQL queries can call Andl operators.

The Spark-world equivalent inverts the hosting the same way the
reference does: ``register_catalog_sql(session, spark)`` takes an
:class:`AndlSession` (whose defs/relvars may come from a persisted
catalog — Catalog.cs stored operators, re-derived in lang/interp.py)
and makes them reachable from ``spark.sql``:

* every catalog **relvar** becomes a temporary view (the DataFrames are
  already lazy Spark plans, so this is free and fully pushdown-capable);
* every **scalar operator** (``def f(x:0) => 44*x`` …) is compiled from
  its stored AST into a plain picklable Python closure and registered
  via ``spark.udf.register`` under ``andl_<name>`` — recursion and
  cross-def calls included (setup-workbench.andl:12 ``fib``).

Scope mirrors the PL boundary: only the SCALAR operator surface crosses
into SQL (numbers as doubles, text, bool, time). Relation-typed
operators don't bridge as UDFs — their job is done by the relvar views
plus ordinary Spark SQL over them — and defs using unsupported
constructs are skipped with a warning rather than failing registration
(same posture as plandl's type-mapping limits,
AndlPg/PostgresLibpqInterop.cs). These closures are the UDF slow path
by design: a bridged call is per-row Python, exactly as a plandl call
was a per-row CLR hop; hot-path work belongs in the native operators.
"""

from __future__ import annotations

import logging
from decimal import Decimal

_LOG = logging.getLogger("andl_spark.sqlbridge")

#: Andl type → Spark SQL return type for bridged UDFs
_RTYPE = {"number": "double", "text": "string", "bool": "boolean",
          "time": "timestamp"}

#: pure-Python builtins available inside bridged defs (Builtin.cs
#: scalar surface; the subset with no engine dependence)
_BUILTINS = {
    "length": lambda s: float(len(s)),
    "trim": lambda s: s.strip(),
    "tolower": lambda s: s.lower(),
    "toupper": lambda s: s.upper(),
    # left/right PAD to width n when the string is shorter — same
    # semantics as the native interpreter (interp.py:922-930) and the
    # reference (Builtin.cs:917-930 PadRight/PadLeft); n <= 0 -> ''.
    "left": lambda s, n: (s.ljust(int(n)) if int(n) >= len(s)
                          else s[: max(int(n), 0)]),
    "right": lambda s, n: (s.rjust(int(n)) if int(n) >= len(s)
                           else s[len(s) - int(n):]) if int(n) > 0 else "",
    "before": lambda s, sub: s.split(sub, 1)[0] if sub in s else s,
    "after": lambda s, sub: s.split(sub, 1)[1] if sub in s else "",
    "fill": lambda s, n: (s * (int(n) // max(1, len(s)) + 1))[: int(n)]
    if s and int(n) > 0 else "",
    "abs": lambda x: abs(float(x)),
    "max": lambda a, b: max(a, b),
    "min": lambda a, b: min(a, b),
}


def _num(v) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, Decimal):
        return float(v)
    return float(v)


def _compile_scalar(ast, params: list[str], defs: dict):
    """AST → Python callable(env_values) for the scalar subset.
    Raises ValueError on constructs outside it (relational nodes,
    tuples, folds) — caller skips that def."""
    kind = ast[0]
    if kind in ("num", "str", "bool"):
        v = float(ast[1]) if kind == "num" else ast[1]
        return lambda env: v
    if kind == "name":
        n = ast[1]
        if n in params:
            return lambda env: env[n]
        raise ValueError(f"free name {n!r} (only parameters bridge)")
    if kind == "neg":
        f = _compile_scalar(ast[1], params, defs)
        return lambda env: -_num(f(env))
    if kind == "not":
        f = _compile_scalar(ast[1], params, defs)
        return lambda env: not f(env)
    if kind == "if":
        c = _compile_scalar(ast[1], params, defs)
        t = _compile_scalar(ast[2], params, defs)
        e = _compile_scalar(ast[3], params, defs)
        return lambda env: t(env) if c(env) else e(env)
    if kind == "binop":
        op, l, r = ast[1], ast[2], ast[3]
        fl = _compile_scalar(l, params, defs)
        fr = _compile_scalar(r, params, defs)
        if op in ("+", "-", "*", "/", "div", "mod", "^"):
            def arith(env, op=op):
                a, b = _num(fl(env)), _num(fr(env))
                if op == "+":
                    return a + b
                if op == "-":
                    return a - b
                if op == "*":
                    return a * b
                if op == "/":
                    return a / b
                if op == "div":
                    return float(int(a // b))
                if op == "mod":
                    return a - b * int(a // b)
                return a ** b
            return arith
        if op == "&":
            def cat(env):
                def s(v):
                    if isinstance(v, float) and v == int(v):
                        return str(int(v))
                    return str(v)
                return s(fl(env)) + s(fr(env))
            return cat
        if op in ("=", "<>", "<", "<=", ">", ">="):
            import operator as _o

            cmp = {"=": _o.eq, "<>": _o.ne, "<": _o.lt, "<=": _o.le,
                   ">": _o.gt, ">=": _o.ge}[op]
            return lambda env: cmp(fl(env), fr(env))
        if op in ("and", "or", "xor"):
            return {
                "and": lambda env: bool(fl(env)) and bool(fr(env)),
                "or": lambda env: bool(fl(env)) or bool(fr(env)),
                "xor": lambda env: bool(fl(env)) != bool(fr(env)),
            }[op]
        if op == "=~":
            import re as _re

            return lambda env: _re.search(str(fr(env)), str(fl(env))) is not None
        raise ValueError(f"operator {op!r} outside the scalar bridge")
    if kind == "call":
        name, args = ast[1], ast[2]
        fargs = [_compile_scalar(a, params, defs) for a in args]
        if name in defs:  # cross-def / recursive call — late lookup
            def call_def(env):
                return defs[name]([f(env) for f in fargs])
            return call_def
        if name in _BUILTINS:
            fn = _BUILTINS[name]
            return lambda env: fn(*[f(env) for f in fargs])
        raise ValueError(f"call to {name!r} outside the scalar bridge")
    raise ValueError(f"AST node {kind!r} outside the scalar bridge")


def _bridge_def(fd, defs: dict):
    """FuncDef → picklable callable(list-of-arg-values)."""
    if fd.body[0] != "body":
        raise ValueError("statement-bodied defs don't bridge")
    params = [p for p, _ in fd.params]
    body = _compile_scalar(fd.body[1], params, defs)

    def call(args, params=params, body=body):
        return body(dict(zip(params, args)))

    return call


def register_catalog_sql(session, spark, prefix: str = "andl_") -> list[str]:
    """Expose an AndlSession's catalog to ``spark.sql`` (the plandl /
    AndlPg analog): relvars become temp views; scalar defs become
    ``<prefix><name>`` UDFs. Returns the registered UDF names.
    Unbridgeable defs (relational, statement-bodied, unsupported
    builtins) are skipped with a warning — same boundary plandl draws
    at the PG type border."""
    from .interp import RelV

    for name, val in session.globals.items():
        if isinstance(val, RelV):
            # '^name' is the interpreter's persisted-relvar marker — in
            # SQL the relvar is just its bare name; names that still
            # aren't valid SQL identifiers are skipped (logged)
            vname = name.lstrip("^")
            if not vname.isidentifier():
                _LOG.warning("relvar %s not exposed as a view (name)", name)
                continue
            val.rel.df.createOrReplaceTempView(vname)

    registered: list[str] = []
    # Shared late-lookup table so defs can recurse AND call each other
    # regardless of definition order (forward references and mutual
    # recursion both bridge). Pre-seed EVERY def name before compiling:
    # `call` compilation only checks membership, the actual callable is
    # looked up at invocation time.
    bridged: dict = {name: None for name in session.defs}
    compiled: dict = {}
    failed: dict[str, str] = {}
    for name, overloads in session.defs.items():
        fd = overloads[-1]  # latest overload wins (reference redefine rule)
        try:
            bridged[name] = compiled[name] = _bridge_def(fd, bridged)
        except ValueError as e:
            failed[name] = str(e)
    # A def that compiled but (transitively) calls a failed def would
    # raise TypeError at invocation (None is not callable) — drop those
    # too, iterating until the dependency closure is stable.
    while failed:
        for name in failed:
            bridged.pop(name, None)
            compiled.pop(name, None)
            _LOG.warning("def %s not bridged to Spark SQL: %s",
                         name, failed[name])
        failed = {}
        for name, fd_overloads in session.defs.items():
            if name not in compiled:
                continue
            fd = fd_overloads[-1]
            try:
                bridged[name] = compiled[name] = _bridge_def(fd, bridged)
            except ValueError as e:
                failed[name] = f"depends on an unbridged def: {e}"
    for name in compiled:
        fd = session.defs[name][-1]
        rtype = _RTYPE.get(fd.rtype, "double")
        fn = compiled[name]
        spark.udf.register(
            f"{prefix}{name}",
            (lambda *args, fn=fn: fn(list(args))),
            rtype,
        )
        registered.append(f"{prefix}{name}")
    return registered
