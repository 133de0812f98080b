"""Minimal Andl language front-end.

Parses and executes the query subset of the Andl language — enough to
run the reference's own relational test suites (Test/SuiteRelDyadic,
SuiteRelWhile, SuiteRelFold, SuiteRelOrder, SuiteRelNest) directly
against the andl_spark engine, so the reference's scripts drive this
engine the way they drive the original.

Reference: grammar Andl.Peg/Andl.grammar.peg, parser
Andl.Peg/PegParser.cs, compiler Andl.Peg/PegCompiler.cs. This is a
re-derivation of the surface syntax semantics, not a port: parsing is a
hand-written Pratt parser and evaluation targets Spark DataFrames
through the andl_spark operator library.
"""

from .interp import AndlSession, run_file, run_script

__all__ = ["AndlSession", "run_file", "run_script"]
