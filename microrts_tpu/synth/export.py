"""Synthesized-program serialization and export — the script-artifact
layer of the reference's synthesis package.

The reference persists evolved strategies as chromosome files
(ai/synthesis/grammar/model/ProgramScript.java:30-60 prints gene lists
to PrintWriters; the dslTree classes translate them back into runnable
script objects, S2DSL.java and friends) so a synthesis run's winners
outlive the run and can be replayed or shipped.  Here the program AST
(synth/dsl.py frozen dataclasses) *is* the chromosome; this module
gives it the same artifact lifecycle:

* ``dumps`` / ``loads`` — a stable text form (the dataclass reprs,
  parsed back in a namespace containing only the AST constructors);
* ``to_module`` — a standalone importable Python module embedding the
  program plus a ``make(env)`` factory (the "compile the evolved
  script to source" analog of the Java tree-to-script translation);
* ``save_program`` / ``load_program`` — file helpers.
"""

from __future__ import annotations

from . import dsl as _dsl
from .dsl import Program

# every frozen-dataclass AST node + the container types, nothing else
_AST_NAMES = [n for n in dir(_dsl)
              if isinstance(getattr(_dsl, n), type)
              and getattr(getattr(_dsl, n), "__dataclass_fields__", None)
              is not None]
_NAMESPACE = {n: getattr(_dsl, n) for n in _AST_NAMES}


def dumps(prog: Program) -> str:
    """Stable one-expression text form of a program (a tuple of
    dataclass reprs — deterministic because every field is a primitive
    or a nested AST node)."""
    inner = ",\n ".join(repr(c) for c in prog)
    return f"(\n {inner},\n)"


def loads(text: str) -> Program:
    """Parse ``dumps`` output.  Evaluated with NO builtins and only the
    AST constructors in scope, so the format cannot smuggle code."""
    prog = eval(text, {"__builtins__": {}}, dict(_NAMESPACE))
    if not isinstance(prog, tuple):
        raise ValueError("program text must be a tuple of commands")
    for c in prog:
        if type(c).__name__ not in _NAMESPACE:
            raise ValueError(f"unknown command node: {type(c).__name__}")
    return prog


def to_module(prog: Program, name: str = "synthesized") -> str:
    """Standalone module source: import + PROGRAM + make(env) factory."""
    names = sorted({type(c).__name__ for c in _walk(prog)})
    return (
        f'"""Auto-exported synthesized strategy: {name}.\n\n'
        f'Round-trips through microrts_tpu.synth.export; build the bot\n'
        f'with ``make(env)`` (a pure jittable (state, player, key) ->\n'
        f'[H, W, 7] policy like every registry bot).\n"""\n\n'
        f"from microrts_tpu.synth.dsl import ({', '.join(names)},\n"
        f"                                    compile_program)\n\n"
        f"PROGRAM = {dumps(prog)}\n\n\n"
        f"def make(env):\n"
        f"    return compile_program(env, PROGRAM)\n")


def _walk(prog):
    for c in prog:
        yield c
        body = getattr(c, "then", None) or getattr(c, "body", None)
        if body:
            yield from _walk(body)
        cond = getattr(c, "cond", None)
        if cond is not None:
            yield cond


def save_program(prog: Program, path: str) -> None:
    with open(path, "w") as f:
        f.write(dumps(prog) + "\n")


def load_program(path: str) -> Program:
    with open(path) as f:
        return loads(f.read())
