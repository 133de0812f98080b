"""Lexer + Pratt parser for the Andl query subset.

Produces a small AST (tuples of ('kind', ...)) consumed by interp.py.
Grammar reference: Andl.Peg/Andl.grammar.peg (hand re-derived, not a
port of the PEG machinery).

Syntax covered (the relational suites + sample query subset):
  statements   var / := assignment / def / type / expression / directives
  literals     number, 'text' ('' escape), "text", t'...' time, true/false,
               tuple {a:=e,...} / tup(...), relation {{...}}, rel:{...}(...),
               rel:NAME(...), rel({...}), {{heading} (row),(row)}, {{*}}
  operators    + - * / mod & = <> < > <= >= =~ and or not, unary -
  relational   infix: join joinl joinr joinlc joinlr joincr compose
               ajoin ajoinl rajoin rajoinr minus rminus intersect
               symdiff union
  postfix      .name, .name(args), .select{...}, .where(e), .order(keys),
               .while(e), .{ ... }
  calls        f(args)

Newline handling: expressions continue across newlines only through an
infix operator, a dot, or inside brackets — a '(' or identifier at the
start of a line begins a new statement (matches how the suites are
written; Andl proper is newline-sensitive the same way).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from decimal import Decimal

# ---------------------------------------------------------------------
# lexer
# ---------------------------------------------------------------------

_KEYWORDS = {
    "and", "or", "not", "xor", "mod", "div", "true", "false",
    "var", "def", "type", "do", "if",
    "join", "joinl", "joinr", "joinlc", "joinlr", "joincr", "compose",
    "ajoin", "ajoinl", "rajoin", "rajoinr",
    "minus", "rminus", "intersect", "symdiff", "union",
    "semijoin", "divide", "rsemijoin", "rdivide",
    "sub", "sup", "sep",
    "rel", "tup", "wait",
}

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>[ \t\r﻿]+)
    | (?P<comment>//[^\n]*)
    | (?P<nl>\n)
    | (?P<directive>\#[A-Za-z]\w*[^\n]*)
    | (?P<time>t'[^']*')
    | (?P<binary>b'[^']*')
    | (?P<dchar>d'[^']*')
    | (?P<hchar>h'[^']*')
    | (?P<iident>i'[^']*')
    | (?P<string>'[^']*'|"[^"]*")
    | (?P<number>\d+(?:\.\d*)?)
    | (?P<hexnum>\$\d[0-9a-fA-F]*(?![A-Za-z_0-9]))
    | (?P<ident>[@^$]?[A-Za-z_]\w*\#?)
    | (?P<dblbrace>\{\{|\}\})
    | (?P<op>:=|=~|<>|<=|>=|=>|\*\*|[-+*/&=<>(){},.%:])
""",
    re.VERBOSE,
)


@dataclass
class Tok:
    kind: str  # 'num' 'str' 'time' 'ident' 'kw' 'op' 'directive' 'eof'
    text: str
    line: int
    nl_before: bool  # a newline separates this token from the previous one


def tokenize(src: str) -> list[Tok]:
    src = src.lstrip("﻿")
    toks: list[Tok] = []
    line = 1
    nl = True
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"andl lex error at line {line}: {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "ws" or kind == "comment":
            continue
        if kind == "nl":
            line += 1
            nl = True
            continue
        if kind == "directive":
            toks.append(Tok("directive", text.strip(), line, nl))
        elif kind == "number":
            toks.append(Tok("num", text, line, nl))
        elif kind == "hexnum":
            # $2a — hex number literal (sample1.andl:44)
            toks.append(Tok("num", str(int(text[1:], 16)), line, nl))
        elif kind == "iident":
            # quoted identifier i'...' — adjacent string-ish literals
            # extend the name (SuiteBasic.andl:13 `i':=' "''" d'32'`)
            toks.append(Tok("iident", text[2:-1], line, nl))
        elif kind == "string":
            # no escape sequences: 'a''bc' is two adjacent literals,
            # concatenated by the parser (SuiteRelBasic.andl:24)
            if toks and toks[-1].kind == "iident" and not nl:
                toks[-1].text += text[1:-1]
            else:
                toks.append(Tok("str", text[1:-1], line, nl))
        elif kind == "time":
            toks.append(Tok("time", text[2:-1], line, nl))
        elif kind == "binary":
            toks.append(Tok("bin", text[2:-1], line, nl))
        elif kind in ("dchar", "hchar"):
            # d'33 34' / h'd a' — text from decimal / hex char codes
            base = 10 if kind == "dchar" else 16
            s = "".join(chr(int(x, base)) for x in text[2:-1].split())
            if toks and toks[-1].kind == "iident" and not nl:
                toks[-1].text += s
            else:
                toks.append(Tok("str", s, line, nl))
        elif kind == "ident":
            toks.append(Tok("kw" if text in _KEYWORDS else "ident", text, line, nl))
        elif kind == "dblbrace":
            toks.append(Tok("op", text, line, nl))
        else:
            toks.append(Tok("op", text, line, nl))
        nl = False
    for t in toks:
        if t.kind == "iident":
            t.kind = "ident"
    toks.append(Tok("eof", "", line, True))
    return toks


# ---------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------

_DYADIC = {
    "join", "joinl", "joinr", "joinlc", "joinlr", "joincr", "compose",
    "ajoin", "ajoinl", "rajoin", "rajoinr",
    "minus", "rminus", "intersect", "symdiff", "union",
    "semijoin", "divide", "rsemijoin", "rdivide",
    "sub", "sup", "sep",
}

# precedence (higher binds tighter); '=' family is comparison
_BINOP_PREC = {
    "or": 10, "xor": 10,
    "and": 20,
    "=": 30, "<>": 30, "<": 30, ">": 30, "<=": 30, ">=": 30, "=~": 30,
    "&": 40,
    "+": 50, "-": 50,
    "*": 60, "/": 60, "mod": 60, "div": 60,
    "**": 70,  # right-assoc (SuiteBasic.andl precedence block)
}
_DYADIC_PREC = 35  # relational dyadics bind tighter than comparison


class Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    # -- token helpers -------------------------------------------------
    def peek(self, k: int = 0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        if t.kind != "eof":
            self.i += 1
        return t

    def at(self, text: str) -> bool:
        t = self.peek()
        return t.text == text and t.kind in ("op", "kw")

    def accept(self, text: str) -> bool:
        if self.at(text):
            self.next()
            return True
        return False

    def expect(self, text: str) -> Tok:
        t = self.next()
        if t.text != text:
            raise SyntaxError(f"andl parse error line {t.line}: expected {text!r}, got {t.text!r}")
        return t

    # -- statements ----------------------------------------------------
    def parse_program(self) -> list:
        stmts = []
        while self.peek().kind != "eof":
            t = self.peek()
            if t.kind == "directive":
                self.next()
                stmts.append(("directive", t.text, t.line))
                continue
            if t.kind == "kw" and t.text == "wait":
                if self.peek(1).text == "=>":  # setup.andl: wait => pause(p)
                    self.next()
                    self.next()
                    stmts.append(("def", "wait", [], ("body", self.parse_expr()),
                                  t.line, None))
                    continue
                self.next()
                continue
            stmts.append(self.parse_statement())
        return stmts

    def parse_statement(self):
        t = self.peek()
        if t.kind == "kw" and t.text == "var":
            return self.parse_var()
        if t.kind == "kw" and t.text == "def":
            return self.parse_def()
        if t.kind == "kw" and t.text == "type":
            return self.parse_type()
        if t.kind == "ident" and t.text == "update" and self.peek(1).kind == "ident":
            # update <relvar> union REL | update <relvar> .where(p).select{...}
            self.next()
            name = self.peek().text
            return ("update", name, self.parse_expr(), t.line)
        if t.kind == "ident" and self.peek(1).text == ":=":
            name = self.next().text
            self.next()
            return ("assign", name, self.parse_expr(), t.line)
        if t.kind == "ident" and self.peek(1).text == "=>":
            # argless operator: `def1 => 42`, `fnret2 => do {...}`
            name = self.next().text
            self.next()
            if self.peek().text == "update" and self.peek(1).kind == "ident":
                # deferred update: `up1 => update S union {{...}}`
                return ("def", name, [], ("do", [self.parse_statement()]), t.line, None)
            if self.peek().kind == "kw" and self.peek().text == "do":
                self.next()
                self.expect("{")
                body = []
                while not self.at("}"):
                    body.append(self.parse_statement())
                self.expect("}")
                return ("def", name, [], ("do", body), t.line, None)
            return ("def", name, [], ("body", self.parse_expr()), t.line, None)
        return ("expr", self.parse_expr(), t.line)

    def parse_var(self):
        line = self.expect("var").line
        name = self.next().text
        if self.accept(":="):
            return ("assign", name, self.parse_expr(), line)
        if self.accept("("):  # var orgchart(csv) — heading inferred
            source = self.next().text
            self.expect(")")
            decls = [("var_decl", name, None, source, line)]
            while self.accept(","):
                # var Album(db), Employee(db), ... (setup-chinook.andl:9)
                nm = self.next().text
                self.expect("(")
                src = self.next().text
                self.expect(")")
                decls.append(("var_decl", nm, None, src, line))
            return decls[0] if len(decls) == 1 else ("block", decls, line)
        self.expect(":")
        dbl = self.accept("{{")
        if not dbl:
            self.expect("{")
        heading = self.parse_heading()
        self.expect("}}" if dbl else "}")
        if dbl:
            pass
        source = None
        if self.accept("("):
            source = self.next().text  # csv / sql / ...
            self.expect(")")
        return ("var_decl", name, heading, source, line)

    def parse_heading(self) -> list[tuple[str, str]]:
        """A:type pairs; type omitted means text. Types: number, text,
        time, bool, 0 (number), '' (text)."""
        cols: list[tuple[str, str]] = []
        if self.at(":"):  # {{:}} empty heading
            self.next()
            return cols
        while not (self.at("}") or self.at("}}")):
            name = self.next().text
            ctype = "text"
            if self.accept(":"):
                t = self.next()
                ctype = _type_name(t)
            cols.append((name, ctype))
            if not self.accept(","):
                break
        return cols

    def parse_def(self):
        line = self.expect("def").line
        name = self.next().text
        rtype = None
        if self.accept(":"):  # result-type annotation: def f:0(...)
            rtype = _type_name(self.next())
        params, body = self.parse_def_tail()
        return ("def", name, params, body, line, rtype)

    def parse_def_tail(self):
        self.expect("(")
        params: list[tuple[str, str]] = []
        while not self.at(")"):
            pname = self.next().text
            ptype = "number"
            if self.accept(":"):
                if self.at("{{"):  # relation-literal type: data:{{ str:'' }}
                    self.next()
                    self.parse_relation_literal()
                    ptype = "relation"
                else:
                    t = self.next()
                    ptype = _type_name(t)
            params.append((pname, ptype))
            if not self.accept(","):
                break
        self.expect(")")
        self.expect("=>")
        if self.peek().text == "update" and self.peek(1).kind == "ident":
            # statement-bodied def: `def addsuppliers(adds:S) =>
            # update S union adds` (setup-workbench.andl:11)
            return params, ("do", [self.parse_statement()])
        if self.peek().kind == "kw" and self.peek().text == "do":
            self.next()
            self.expect("{")
            body = []
            while not self.at("}"):
                body.append(self.parse_statement())
            self.expect("}")
            return params, ("do", body)
        return params, ("body", self.parse_expr())

    def parse_type(self):
        line = self.expect("type").line
        decls = []
        while True:  # type a(...), b(...), ... (sample4.andl:69)
            name = self.next().text
            self.expect("(")
            fields = []
            while not self.at(")"):
                fname = self.next().text
                ftype = "text"
                if self.accept(":"):
                    if self.peek().kind == "kw" and self.peek().text == "def":
                        # function-typed field: f:def(a:'')=>'' (SuiteDefer tfnv)
                        self.next()
                        self.parse_def_tail()
                        ftype = "func"
                    elif self.at("{{"):
                        # relation-typed component: r:{{a:text,b:text}}
                        # (setup-workbench.andl:17 type utx)
                        self.next()
                        self.parse_relation_literal()
                        ftype = "relation"
                    else:
                        ftype = _type_name(self.next())
                fields.append((fname, ftype))
                if not self.accept(","):
                    break
            self.expect(")")
            decls.append(("type", name, fields, line))
            if not self.accept(","):
                break
        return decls[0] if len(decls) == 1 else ("block", decls, line)

    # -- expressions ---------------------------------------------------
    def parse_expr(self, min_prec: int = 0):
        lhs = self.parse_unary()
        while True:
            t = self.peek()
            if t.kind == "kw" and t.text in _DYADIC:
                if _DYADIC_PREC < min_prec:
                    break
                self.next()
                rhs = self.parse_expr(_DYADIC_PREC + 1)
                lhs = ("dyadic", t.text, lhs, rhs)
                continue
            op = t.text if t.kind in ("op", "kw") else None
            if op in _BINOP_PREC and not (t.kind == "kw" and op not in ("and", "or", "xor", "mod", "div")):
                prec = _BINOP_PREC[op]
                if prec < min_prec:
                    break
                self.next()
                rhs = self.parse_expr(prec if op == "**" else prec + 1)
                lhs = ("binop", op, lhs, rhs)
                continue
            break
        return lhs

    def parse_unary(self):
        t = self.peek()
        if t.text == "-" and t.kind == "op":
            self.next()
            return ("neg", self.parse_unary())
        if t.kind == "kw" and t.text == "not":
            self.next()
            return ("not", self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self):
        e = self.parse_primary()
        while True:
            t = self.peek()
            if t.text == "." and t.kind == "op":
                self.next()
                e = self.parse_dot(e)
                continue
            # call directly adjacent (no newline): f(...)
            if t.text == "(" and t.kind == "op" and not t.nl_before and e[0] in ("name", "deflit"):
                if e[0] == "name" and e[1] == "fold":
                    e = self.parse_fold_call()
                    continue
                self.next()
                args = self.parse_args()
                e = ("call", e[1], args) if e[0] == "name" else ("callv", e, args)
                continue
            break
        return e

    def parse_fold_call(self):
        """fold(op, expr) — op may be an operator symbol (+,-,*,/,&),
        a logical keyword (and/or/union), or a function name."""
        self.expect("(")
        t = self.peek()
        if t.kind in ("op", "kw") and t.text in ("+", "-", "*", "/", "&", "and", "or", "xor", "union"):
            self.next()
            op = t.text
        else:
            op = self.next().text
        self.expect(",")
        val = self.parse_expr()
        self.expect(")")
        return ("fold", op, val)

    def parse_dot(self, recv):
        t = self.next()
        if t.text == "{":  # .{ ... }  select shorthand
            items = self.parse_select_items()
            return ("select", recv, items)
        name = t.text
        if name == "select":
            if self.accept("{"):
                return ("select", recv, self.parse_select_items())
            self.expect("(")
            # .select( (expr) ) / .select(expr...) — lift or item list
            items = self.parse_select_list_paren()
            return ("select", recv, items)
        if name == "where":
            self.expect("(")
            cond = self.parse_expr()
            self.expect(")")
            return ("where", recv, cond)
        if name == "order":
            self.expect("(")
            keys = []
            while not self.at(")"):
                grouped = self.accept("%")
                desc = self.accept("-")
                keys.append((self.next().text, desc, grouped))
                if not self.accept(","):
                    break
            self.expect(")")
            return ("order", recv, keys)
        if name == "while":
            self.expect("(")
            body = self.parse_expr()
            self.expect(")")
            return ("while", recv, body)
        if self.peek().text == "(" and not self.peek().nl_before:
            self.next()
            args = self.parse_args()
            return ("call", name, [recv, *args])
        return ("dotname", recv, name)

    def parse_select_items(self):
        """Items inside .select{ ... }: '*', name, name := expr, (expr)."""
        items = []
        while not self.at("}"):
            if self.accept("*"):
                items.append(("star",))
                self.accept(",")  # comma after * is optional: { * F1 := SNAME }
                continue
            elif self.at("("):
                self.next()
                e = self.parse_expr()
                self.expect(")")
                items.append(("lift", e))
            elif self.peek().kind == "ident" and self.peek(1).text == ":=":
                name = self.next().text
                self.next()
                items.append(("bind", name, self.parse_expr()))
            else:
                e = self.parse_expr()
                if e[0] == "name":
                    items.append(("keep", e[1]))
                else:
                    items.append(("lift", e))
            if not self.accept(","):
                break
        self.expect("}")
        return items

    def parse_select_list_paren(self):
        items = []
        while not self.at(")"):
            if self.at("("):
                self.next()
                e = self.parse_expr()
                self.expect(")")
                items.append(("lift", e))
            elif self.peek().kind == "ident" and self.peek(1).text == ":=":
                name = self.next().text
                self.next()
                items.append(("bind", name, self.parse_expr()))
            else:
                e = self.parse_expr()
                if e[0] == "name":
                    items.append(("keep", e[1]))
                else:
                    items.append(("lift", e))
            if not self.accept(","):
                break
        self.expect(")")
        return items

    def parse_args(self):
        args = []
        while not self.at(")"):
            args.append(self.parse_expr())
            if not self.accept(","):
                break
        self.expect(")")
        return args

    def parse_primary(self):
        t = self.next()
        if t.kind == "num":
            # Andl Number is C# decimal (Andl.Runtime/TypedValue.cs:78):
            # keep the literal EXACT as decimal.Decimal so driver-side
            # arithmetic (interp.py) matches the reference's decimal
            # semantics — `0.1` is one-tenth, not the nearest double.
            return ("num", Decimal(t.text))
        if t.kind == "str":
            # adjacent string-ish literals concatenate: 'abc def' d'33'
            text = t.text
            while self.peek().kind == "str" and not self.peek().nl_before:
                text += self.next().text
            return ("str", text)
        if t.kind == "bin":
            return ("binlit", t.text)
        if t.kind == "time":
            return ("timelit", t.text)
        if t.kind == "kw" and t.text in ("true", "false"):
            return ("bool", t.text == "true")
        if t.kind == "kw" and t.text == "def":
            # anonymous function value: def(a:'') => a & a (SuiteDefer funvals)
            params, body = self.parse_def_tail()
            return ("deflit", params, body)
        if t.kind == "kw" and t.text == "do":
            # do { ... } as an expression: local scope, value of last
            # expression (sample1.andl Statements block)
            self.expect("{")
            body = []
            while not self.at("}"):
                body.append(self.parse_statement())
            self.expect("}")
            return ("doblock", body)
        if t.kind == "kw" and t.text == "if":
            self.expect("(")
            cond = self.parse_expr()
            self.expect(",")
            then = self.parse_expr()
            self.expect(",")
            other = self.parse_expr()
            self.expect(")")
            return ("if", cond, then, other)
        if t.kind == "kw" and t.text == "tup":
            self.expect("(")
            binds = []
            while not self.at(")"):
                name = self.next().text
                self.expect(":=")
                binds.append((name, self.parse_expr()))
                if not self.accept(","):
                    break
            self.expect(")")
            return ("tuple", binds)
        if t.kind == "kw" and t.text == "mod" and self.at("("):
            # function form: mod(x, y) (100doors.andl isopen)
            self.next()
            args = self.parse_args()
            return ("call", "mod", args)
        if t.kind == "kw" and t.text == "rel":
            return self.parse_rel_constructor()
        if t.kind == "ident":
            return ("name", t.text)
        if t.text == "(":
            e = self.parse_expr()
            self.expect(")")
            return e
        if t.text == "{{":
            return self.parse_relation_literal()
        if t.text == "{":
            return self.parse_tuple_literal()
        raise SyntaxError(f"andl parse error line {t.line}: unexpected {t.text!r}")

    def parse_rel_constructor(self):
        """rel:{heading}(rows) | rel:NAME(rows) | rel({tuple},...)"""
        if self.accept(":"):
            if self.at("{"):
                self.next()
                heading = self.parse_heading()
                self.expect("}")
            else:
                heading = ("ref", self.next().text)
            self.expect("(")
            rows = []
            while not self.at(")"):
                self.expect("(")
                vals = []
                while not self.at(")"):
                    vals.append(self.parse_expr())
                    if not self.accept(","):
                        break
                self.expect(")")
                rows.append(vals)
                if not self.accept(","):
                    break
            self.expect(")")
            return ("rel_typed", heading, rows)
        self.expect("(")
        exprs = []
        while not self.at(")"):
            if self.accept("{"):
                exprs.append(("tuple", self.parse_tuple_binds()))
            else:
                exprs.append(self.parse_expr())  # rel(tup1) — tuple-valued expr
            if not self.accept(","):
                break
        self.expect(")")
        return ("rel_call", exprs)

    def _binds_ahead(self) -> bool:
        """True if a ':=' occurs before the closing brace at depth 0."""
        return self._tok_ahead(":=")

    def _colon_ahead(self) -> bool:
        """True if a ':' type annotation occurs before the closer —
        distinguishes the heading form {{A:text}} from the bare
        keep-tuple form {{ S# }} (SPPsample1.andl:12 membership)."""
        return self._tok_ahead(":")

    def _tok_ahead(self, want: str) -> bool:
        depth = 0
        for k in range(self.i, len(self.toks)):
            t = self.toks[k].text
            if t in ("(", "{", "{{"):
                depth += 1
            elif t in (")", "}", "}}"):
                if depth == 0:
                    return False
                depth -= 1
            elif t == want and depth == 0:
                return True
        return False

    def parse_tuple_binds(self):
        binds = []
        while not self.at("}"):
            name = self.next().text
            if self.accept(":="):
                binds.append((name, self.parse_expr()))
            else:  # bare name keeps the attribute: {{ z:=A, B }}
                binds.append((name, ("name", name)))
            if not self.accept(","):
                break
        self.expect("}")
        return binds

    def parse_tuple_literal(self):
        if self.accept("}"):
            return ("tuple", [])
        if self.at("*") and self.peek(1).text == "}":
            self.next()
            self.next()
            return ("tup_star",)  # {*}: current tuple (sample3.andl nest)
        if self.at("{"):
            # single-brace relation of tuple literals: { {..}, {..}, }
            tuples = []
            while self.accept("{"):
                tuples.append(self.parse_tuple_binds())
                if not self.accept(","):
                    break
            self.expect("}")
            return ("rel_tuples", tuples)
        return ("tuple", self.parse_tuple_binds())

    def parse_relation_literal(self):
        """Forms after '{{' (Sample/sample2.andl:17-40, SetupSuite.andl):
        '}}'                          -> {{}}: ONE empty tuple
        '*' [, binds] '}}'            -> current-tuple relation (while body)
        ':' '}}'                      -> {{:}}: empty heading, no tuples
        ':' '}' '('')',... '}'        -> {{:}(),()...}: empty heading + tuples
        binds '}' [',' '{' binds]* '}}'          -> tuple list
        heading '}' '(' vals ')',... '}'         -> heading + rows
        """
        if self.accept("}}"):
            return ("rel_empty", 1)
        if self.accept("*"):
            items = [("star",)]
            while self.accept(","):
                if self.peek().kind == "ident" and self.peek(1).text == ":=":
                    name = self.next().text
                    self.next()
                    items.append(("bind", name, self.parse_expr()))
            self.expect("}}")
            return ("rel_star", items)
        if self.accept(":"):
            if self.accept("}}"):
                return ("rel_empty", 0)
            self.expect("}")
            n_tuples = 0
            while self.accept("("):
                self.expect(")")
                n_tuples = 1
                if not self.accept(","):
                    break
            self.expect("}")
            return ("rel_empty", n_tuples)
        # distinguish tuple-list {{a:=1,...},{...}} from heading form
        # {{A:type,...} (vals)...}: a ':=' ahead of the closer means
        # binds (bare names allowed: {{ z:=MAJOR_P#, MINOR_P# }});
        # all-bare names with NO ':' annotation are keeps of current
        # attributes ({{ S# }}), not an empty typed heading
        if self._binds_ahead() or not self._colon_ahead() or self.peek().text == "}":
            first = self.parse_tuple_binds_dbl()
            tuples = [first]
            while self.accept(","):
                self.expect("{")
                tuples.append(self.parse_tuple_binds_dbl())
            if not self.accept("}}"):  # '} }' with whitespace lexes apart
                self.expect("}")
            return ("rel_tuples", tuples)
        heading = self.parse_heading()
        if self.accept("}}"):  # {{A:type,...}} — heading only, no rows
            return ("rel_typed", heading, [])
        self.expect("}")
        rows = []
        while self.accept("("):
            vals = []
            while not self.at(")"):
                vals.append(self.parse_expr())
                if not self.accept(","):
                    break
            self.expect(")")
            rows.append(vals)
            self.accept(",")
        self.expect("}")
        return ("rel_typed", heading, rows)

    def parse_tuple_binds_dbl(self):
        """First tuple of a {{a:=e,...}...}} literal: ends at '}' or,
        for the single-tuple form, directly at '}}'."""
        binds = []
        while not (self.at("}") or self.at("}}")):
            name = self.next().text
            if self.accept(":="):
                binds.append((name, self.parse_expr()))
            else:  # bare name keeps the attribute: {{ z:=A, B }}
                binds.append((name, ("name", name)))
            if not self.accept(","):
                break
        if self.accept("}}"):
            self.toks.insert(self.i, Tok("op", "}}", 0, False))
            return binds
        self.expect("}")
        return binds


def _type_name(t: Tok) -> str:
    if t.kind == "num":
        return "number"
    if t.kind == "str":
        return "text"
    if t.text in ("number", "text", "time", "bool", "binary"):
        return t.text
    if t.kind == "ident":
        # a relvar / user-type name (`s:Supplier`) — preserved so the
        # Thrift IDL can emit list<Supplier> (ThriftGen parity); the
        # interpreter's dynamic typing ignores it at call time
        return t.text
    return "text"


def parse(src: str) -> list:
    return Parser(tokenize(src)).parse_program()
