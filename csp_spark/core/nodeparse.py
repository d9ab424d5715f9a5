"""Reference-style @csp.node translation — run csp node BODIES verbatim.

The reference's @csp.node decorator AST-parses the function
(csp/impl/wiring/node_parser.py:1-927): ``with csp.state():`` blocks
become persistent per-instance state, ``csp.ticked/valid/output``
become engine intrinsics, and calling the decorated function inside a
graph wires a node. This module is the thin Spark-side analog: the
same source patterns are parsed with ``ast`` and lowered onto
run_node's NodeCycle surface (core/noderun.py) — the state dict is the
per-key state, ticked/valid map to cycle queries, csp.output to the
multi-output dict. No reference code is used; only the documented
source grammar is recognized.

Scope (enough to run the reference README bid/ask example and
examples/01_basics/e4_trade_pnl.py unmodified):
- ``with csp.state():`` assignments  → per-key state (any later
  reference to a state name reads/writes the state dict)
- ``with csp.start():``              → executed once per key on a
  synthetic PRE-INPUT cycle whose ``now`` is the enclosing csp.run's
  starttime (inputs not yet valid, like the reference; state names
  assignable; csp.make_passive / set_buffering_policy are no-ops —
  buffering is the plan's concern in the tick-table model)
- ``with csp.stop():``               → per-key finalizer after the
  last cycle and trailing alarms (side effects + state reads;
  csp.output inside stop is a parse-time error)
- ``csp.ticked(a, b, ...)``          → any-input-ticked
- ``csp.valid(a, b, ...)``           → all-inputs-valid
- ``csp.output(k=v, ...)`` / ``return expr`` → multi / single output
- ``csp.now()``                      → cycle.now
- ``with csp.alarms(): a = csp.alarm(T)`` → channel-tagged entries on
  run_node's alarm heap: ``csp.schedule_alarm(a, delta, v)`` from the
  body OR from ``csp.start()`` (the start cycle's ``now`` is the
  engine start, so start+delta anchors exactly like the reference —
  wiring outside a csp.run raises, there is no start time to anchor
  to), ``csp.ticked(a)``/``csp.valid(a)``, and passive reads of ``a``
  (last fired value) all translate.
"""

from __future__ import annotations

import ast
import datetime as _dt
import inspect
import textwrap
from typing import Any, Callable, Mapping

__all__ = ["is_reference_node", "wire_reference_node", "NodeOutputs"]

_CSP_INTRINSICS = {"ticked", "valid", "output", "now"}
_NOOP_CALLS = {"make_passive", "make_active", "set_buffering_policy"}

#: tick-table reserved column names — a node INPUT with one of these
#: names (the reference's demultiplex takes `key: ts[K]`) rides an
#: internal channel so align() columns never collide
_RESERVED_COLS = {"key", "ts", "seq", "value"}


def _chan(name: str) -> str:
    return f"__in_{name}" if name in _RESERVED_COLS else name


def _is_ts_ann(ann: Any) -> bool:
    from .surface import ts

    return isinstance(ann, type) and issubclass(ann, ts)


def _elem_type(ann: Any) -> str:
    """ts[X] → Spark DDL type for run_node's output schema."""
    from .record import Struct
    from .surface import ts

    elem = getattr(ann, "__csp_elem__", None) if _is_ts_ann(ann) else ann
    if elem is None:
        return "double"
    if isinstance(elem, type) and issubclass(elem, Struct):
        return elem.spark_type().simpleString()
    return {
        float: "double", int: "long", bool: "boolean", str: "string",
        _dt.datetime: "timestamp", _dt.timedelta: "long",
    }.get(elem, "double")


def _hints(fn: Callable) -> dict:
    """Annotations with ``from __future__ import annotations`` strings
    resolved against the function's globals (PEP 563 modules)."""
    try:
        raw = fn.__annotations__
    except AttributeError:
        return {}
    out = {}
    for k, v in raw.items():
        if isinstance(v, str):
            try:
                v = eval(v, fn.__globals__)  # noqa: S307 (author's module)
            except Exception:
                pass
        out[k] = v
    return out


def _is_basket_ann(ann: Any) -> bool:
    """``{ts[K]: ts[V]}`` / ``[ts[T]]`` — the reference's dict- and
    list-basket input annotations (impl/types/tstype.py TsBasket
    grammar)."""
    if (
        isinstance(ann, dict)
        and len(ann) == 1
        and all(
            _is_ts_ann(k) and _is_ts_ann(v) for k, v in ann.items()
        )
    ):
        return True
    return (
        isinstance(ann, list) and len(ann) == 1 and _is_ts_ann(ann[0])
    )


def is_reference_node(fn: Callable) -> bool:
    """A reference-style node takes ts[...]-annotated (or dict-basket)
    inputs; the imperative run_node style takes a single untyped
    ``cycle``."""
    return any(
        _is_ts_ann(a) or _is_basket_ann(a) for a in _hints(fn).values()
    )


class _Rewriter(ast.NodeTransformer):
    def __init__(self, state_names, input_names, csp_aliases, multi,
                 alarm_names=(), basket_names=(), basket_output=False):
        self.state = set(state_names)
        self.inputs = set(input_names)
        self.csp = set(csp_aliases)
        self.multi = multi
        self.alarms = set(alarm_names)
        self.baskets = set(basket_names)
        self.basket_output = basket_output

    def _is_csp_call(self, node: ast.Call) -> str | None:
        f = node.func
        if (
            isinstance(f, ast.Attribute)
            and isinstance(f.value, ast.Name)
            and f.value.id in self.csp
        ):
            return f.attr
        return None

    def visit_Name(self, node: ast.Name):
        if node.id in self.state:
            return ast.copy_location(
                ast.Subscript(
                    value=ast.Name(id="__cycle_state", ctx=ast.Load()),
                    slice=ast.Constant(value=node.id),
                    ctx=node.ctx,
                ),
                node,
            )
        if node.id in self.alarms and isinstance(node.ctx, ast.Load):
            # passive alarm read → the channel's LAST fired value
            return ast.copy_location(
                ast.Call(
                    func=ast.Attribute(
                        value=ast.Name(id="__alarm_last", ctx=ast.Load()),
                        attr="get", ctx=ast.Load(),
                    ),
                    args=[ast.Constant(value=node.id)], keywords=[],
                ),
                node,
            )
        return node

    def _alarm_term(self, kind: str, name: str) -> ast.expr:
        """csp.ticked(alarm) / csp.valid(alarm) forms."""
        if kind == "ticked":
            # this cycle IS channel `name`'s alarm firing
            return ast.parse(
                f"(__c.ticked('alarm') and __c.alarm[0] == {name!r})",
                mode="eval",
            ).body
        return ast.parse(f"({name!r} in __alarm_last)", mode="eval").body

    def visit_Call(self, node: ast.Call):
        name = self._is_csp_call(node)
        if name is None:
            return self.generic_visit(node)
        if name in _NOOP_CALLS:
            return ast.copy_location(ast.Constant(value=None), node)
        if name in ("ticked", "valid"):
            terms = []
            for a in node.args:
                if isinstance(a, ast.Name) and a.id in self.alarms:
                    terms.append(self._alarm_term(name, a.id))
                    continue
                if isinstance(a, ast.Name) and a.id in self.baskets:
                    # basket query: ANY member ticked / ALL valid
                    meth = (
                        "_any_ticked" if name == "ticked" else "_all_valid"
                    )
                    terms.append(
                        ast.parse(f"{a.id}.{meth}()", mode="eval").body
                    )
                    continue
                if not isinstance(a, ast.Name) or a.id not in self.inputs:
                    raise SyntaxError(
                        f"csp.{name}() argument must be an input or "
                        "alarm name"
                    )
                terms.append(
                    ast.Call(
                        func=ast.Attribute(
                            value=ast.Name(id="__c", ctx=ast.Load()),
                            attr=name, ctx=ast.Load(),
                        ),
                        args=[ast.Constant(value=_chan(a.id))],
                        keywords=[],
                    )
                )
            if len(terms) == 1:
                out = terms[0]
            else:
                # reference: ticked = ANY of, valid = ALL of
                out = ast.BoolOp(
                    op=ast.Or() if name == "ticked" else ast.And(),
                    values=terms,
                )
            return ast.copy_location(out, node)
        if name == "now":
            return ast.copy_location(
                ast.Attribute(
                    value=ast.Name(id="__c", ctx=ast.Load()),
                    attr="now", ctx=ast.Load(),
                ),
                node,
            )
        if name == "output":
            # parse-time shape errors, mirroring the reference's
            # node_parser: multi-output nodes only accept named
            # outputs; a single unnamed output only the positional
            # form; a BASKET output exactly one positional dict
            # (csp.output({key: value}))
            if self.basket_output:
                if node.keywords or len(node.args) != 1:
                    raise SyntaxError(
                        "csp.output() on a basket-output node takes "
                        "exactly one positional {key: value} dict"
                    )
            elif self.multi and node.args:
                raise SyntaxError(
                    "csp.output() on a node with named outputs takes "
                    "only keyword form: csp.output(name=value)"
                )
            if not self.multi and (node.keywords or len(node.args) != 1):
                raise SyntaxError(
                    "csp.output() on a single unnamed output node "
                    "takes exactly one positional value"
                )
            call = ast.Call(
                func=ast.Name(id="__emit", ctx=ast.Load()),
                args=[self.visit(a) for a in node.args],
                keywords=[
                    ast.keyword(arg=k.arg, value=self.visit(k.value))
                    for k in node.keywords
                ],
            )
            return ast.copy_location(call, node)
        if name == "schedule_alarm":
            # csp.schedule_alarm(alarm, when, value) →
            # __c.schedule_alarm(when, ('alarm', value)): the single
            # run_node heap carries (channel, value) pairs
            if not (node.args and isinstance(node.args[0], ast.Name)
                    and node.args[0].id in self.alarms):
                raise SyntaxError(
                    "csp.schedule_alarm's first argument must be a "
                    "csp.alarm() name"
                )
            ch = node.args[0].id
            when = self.visit(node.args[1])
            val = (
                self.visit(node.args[2]) if len(node.args) > 2
                else ast.Constant(value=True)
            )
            call = ast.parse("__c.schedule_alarm(None, None)",
                             mode="eval").body
            call.args = [
                when,
                ast.Tuple(
                    elts=[ast.Constant(value=ch), val], ctx=ast.Load()
                ),
            ]
            return ast.copy_location(call, node)
        if name == "cancel_alarm":
            # csp.cancel_alarm(alarm, handle) → __c.cancel_alarm(handle)
            call = ast.parse("__c.cancel_alarm(None)", mode="eval").body
            call.args = [self.visit(node.args[-1])]
            return ast.copy_location(call, node)
        return self.generic_visit(node)

    def visit_Return(self, node: ast.Return):
        node = self.generic_visit(node)
        if not self.multi:
            # bare `return` ends the cycle but keeps any value already
            # emitted via csp.output(v) (reference: output is immediate,
            # return only stops execution)
            if node.value is None:
                out = ast.parse("return __out[0]").body[0]
                ast.copy_location(out, node)
                ast.fix_missing_locations(out)
                return out
            return node
        if self.multi:
            # multi-output: every exit returns the emitted dict;
            # `return csp.output(...)` already routed through __emit
            stmts = []
            if node.value is not None:
                stmts.append(ast.Expr(value=node.value))
            stmts.append(
                ast.Return(value=ast.Name(id="__out", ctx=ast.Load()))
            )
            for s in stmts:
                ast.copy_location(s, node)
                ast.fix_missing_locations(s)
            return stmts
        return node


def _parse(fn: Callable):
    src = textwrap.dedent(inspect.getsource(fn))
    tree = ast.parse(src)
    fdef = next(n for n in tree.body if isinstance(n, ast.FunctionDef))

    hints = _hints(fn)
    input_names = [
        a.arg for a in fdef.args.args if _is_ts_ann(hints.get(a.arg))
    ]
    basket_names = [
        a.arg for a in fdef.args.args if _is_basket_ann(hints.get(a.arg))
    ]
    scalar_names = [
        a.arg for a in fdef.args.args
        if a.arg not in input_names and a.arg not in basket_names
    ]

    ret = hints.get("return")
    from .surface import OutputBasketMarker

    basket_out = ret if isinstance(ret, OutputBasketMarker) else None
    if isinstance(ret, dict) and any(_is_ts_ann(k) for k in ret):
        raise NotImplementedError(
            "dynamic (unbounded-key) basket OUTPUTS are not translated "
            "— route by key with csp_spark.dynamic_demultiplex, or "
            "declare the shape: OutputBasket(Dict[K, ts[T]], "
            "shape='<keys arg>')"
        )
    multi = isinstance(ret, dict)
    if multi:
        outputs = {k: _elem_type(v) for k, v in ret.items()}
        output_type = None
    else:
        outputs = None
        output_type = _elem_type(ret) if basket_out is None else None

    # csp module aliases visible to the body (import csp / as-alias) —
    # scanning globals AND closure cells (a node defined inside a
    # function sees `import csp` from the enclosing scope as a freevar)
    import csp_spark as _pkg

    _visible = dict(fn.__globals__)
    if fn.__closure__:
        for _n, _cell in zip(fn.__code__.co_freevars, fn.__closure__):
            try:
                _visible[_n] = _cell.cell_contents
            except ValueError:
                pass
    aliases = {
        n for n, v in _visible.items()
        if v is _pkg or getattr(v, "__name__", "") in ("csp", "csp_spark")
    } or {"csp"}

    state_inits: list[ast.stmt] = []
    start_stmts: list[ast.stmt] = []
    stop_stmts: list[ast.stmt] = []
    alarm_names: list[str] = []
    body: list[ast.stmt] = []
    for stmt in fdef.body:
        if (
            isinstance(stmt, ast.With)
            and len(stmt.items) == 1
            and isinstance(stmt.items[0].context_expr, ast.Call)
            and isinstance(stmt.items[0].context_expr.func, ast.Attribute)
            and isinstance(stmt.items[0].context_expr.func.value, ast.Name)
            and stmt.items[0].context_expr.func.value.id in aliases
        ):
            kind = stmt.items[0].context_expr.func.attr
            if kind == "state":
                state_inits.extend(stmt.body)
            elif kind == "start":
                start_stmts.extend(stmt.body)
            elif kind == "alarms":
                # `a = csp.alarm(T)` declares channel `a`; all channels
                # share run_node's single alarm heap, tagged by name
                for s in stmt.body:
                    if (
                        isinstance(s, ast.Assign)
                        and isinstance(s.targets[0], ast.Name)
                    ):
                        alarm_names.append(s.targets[0].id)
            elif kind == "stop":
                # engine-shutdown finalizer: runs once per key AFTER
                # the last cycle and trailing alarms (side effects +
                # state reads; emitting from stop is not a tick — the
                # reference engine is shutting down too)
                for sub in ast.walk(ast.Module(body=stmt.body,
                                               type_ignores=[])):
                    if (
                        isinstance(sub, ast.Call)
                        and isinstance(sub.func, ast.Attribute)
                        and sub.func.attr == "output"
                        and isinstance(sub.func.value, ast.Name)
                        and sub.func.value.id in aliases
                    ):
                        raise SyntaxError(
                            "csp.output() inside with csp.stop(): is "
                            "not supported — the engine is stopping"
                        )
                stop_stmts.extend(stmt.body)
            else:
                body.append(stmt)
        else:
            body.append(stmt)

    # start-block alarm scheduling anchors at ENGINE start time: the
    # runner models it with a synthetic pre-input cycle whose `now` is
    # the enclosing csp.run's starttime — wiring outside a run() (no
    # ambient start) refuses at call time (wire_reference_node)
    start_has_alarms = any(
        isinstance(sub, ast.Call)
        and isinstance(sub.func, ast.Attribute)
        and sub.func.attr == "schedule_alarm"
        for s in start_stmts
        for sub in ast.walk(s)
    )

    state_names = []
    for s in state_inits:
        if isinstance(s, ast.Assign):
            for t in s.targets:
                if isinstance(t, ast.Name):
                    state_names.append(t.id)
        elif isinstance(s, ast.AnnAssign) and isinstance(s.target, ast.Name):
            state_names.append(s.target.id)
    # names assigned in csp.start() also persist across cycles
    for s in start_stmts:
        if isinstance(s, ast.Assign):
            for t in s.targets:
                if isinstance(t, ast.Name) and t.id not in state_names:
                    state_names.append(t.id)

    return (
        fdef, input_names, basket_names, scalar_names, state_names,
        alarm_names, state_inits, start_stmts, stop_stmts,
        start_has_alarms, body, aliases, multi, outputs, output_type,
        basket_out,
    )


class _AttrView:
    """Attribute access over a struct cycle value (dict from Arrow).

    Nested struct fields wrap on access and WRITE THROUGH to the same
    underlying dict — reference nodes mutate input struct fields
    (``event.item.cost *= discount``, e5_retail_cart) and later read
    the mutated value through any alias."""

    __slots__ = ("_d",)

    def __init__(self, d):
        object.__setattr__(self, "_d", d)

    def __getattr__(self, k):
        try:
            v = self._d[k]
        except KeyError:
            raise AttributeError(k)
        return _AttrView(v) if isinstance(v, dict) else v

    def __setattr__(self, k, v):
        self._d[k] = v

    def __eq__(self, other):
        return self._d == (other._d if isinstance(other, _AttrView) else other)

    def __repr__(self):  # pragma: no cover
        return f"_AttrView({self._d})"


def _wrap(v):
    return _AttrView(v) if isinstance(v, dict) else v


class _BasketView:
    """A dict-basket input as seen inside a node cycle — the
    reference's TsBasket query surface (tickeditems/tickedkeys/
    tickedvalues/validitems/validkeys/validvalues/keys/[]), backed by
    run_node channels, one per basket member."""

    __slots__ = ("_c", "_channels")

    def __init__(self, c, channels: Mapping[str, str]):
        self._c = c
        self._channels = dict(channels)

    def _any_ticked(self) -> bool:
        return any(self._c.ticked(ch) for ch in self._channels.values())

    def _all_valid(self) -> bool:
        return all(self._c.valid(ch) for ch in self._channels.values())

    def tickeditems(self):
        return [
            (k, _wrap(self._c[ch]))
            for k, ch in self._channels.items()
            if self._c.ticked(ch)
        ]

    def tickedkeys(self):
        return [k for k, ch in self._channels.items() if self._c.ticked(ch)]

    def tickedvalues(self):
        return [v for _, v in self.tickeditems()]

    def validitems(self):
        return [
            (k, _wrap(self._c[ch]))
            for k, ch in self._channels.items()
            if self._c.valid(ch)
        ]

    def validkeys(self):
        return [k for k, ch in self._channels.items() if self._c.valid(ch)]

    def validvalues(self):
        return [v for _, v in self.validitems()]

    def keys(self):
        return list(self._channels)

    def __getitem__(self, k):
        return _wrap(self._c[self._channels[k]])

    def __contains__(self, k):
        return k in self._channels

    def __iter__(self):
        return iter(self._channels)

    def __len__(self):
        return len(self._channels)


class NodeOutputs:
    """csp.Outputs result of a wired multi-output node: attribute or
    item access per named output (reference node.outputs surface)."""

    def __init__(self, streams: Mapping[str, Any]):
        self._streams = dict(streams)

    def __getattr__(self, k):
        try:
            return self._streams[k]
        except KeyError:
            raise AttributeError(k)

    def __getitem__(self, k):
        return self._streams[k]

    def keys(self):
        return self._streams.keys()


def _compile_cycle(
    fn: Callable,
    scalars: Mapping[str, Any],
    basket_channels: Mapping[str, Mapping[str, str]] | None = None,
):
    (
        fdef, input_names, basket_names, scalar_names, state_names,
        alarm_names, state_inits, start_stmts, stop_stmts,
        start_has_alarms, body, aliases, multi, outputs, output_type,
        basket_out,
    ) = _parse(fn)

    is_basket_out = basket_out is not None
    rw = _Rewriter(state_names, input_names, aliases,
                   multi or is_basket_out, alarm_names, basket_names,
                   basket_output=is_basket_out)

    def _rewrite(stmts):
        out = []
        for s in stmts:
            r = rw.visit(s)
            rs = r if isinstance(r, list) else [r]
            for x in rs:
                ast.fix_missing_locations(x)
                out.append(x)
        return out

    # per-key state factory: the csp.state() inits, un-rewritten (they
    # run before any state exists), harvested into a dict; scalar node
    # args are in scope (s_cart = Cart(user_id=user_id), e5_retail_cart)
    init_body = [
        ast.parse(f"{n} = __scalars[{n!r}]").body[0] for n in scalar_names
    ] + list(state_inits) + [
        ast.parse(
            "return {"
            + ", ".join(f"{n!r}: {n}" for n in state_names)
            + "}"
        ).body[0]
    ]
    # state names only assigned in csp.start() start life unset
    for n in state_names:
        assigned_in_state = any(
            isinstance(s, (ast.Assign, ast.AnnAssign))
            and n in [
                t.id for t in (
                    s.targets if isinstance(s, ast.Assign) else [s.target]
                ) if isinstance(t, ast.Name)
            ]
            for s in state_inits
        )
        if not assigned_in_state:
            init_body.insert(0, ast.parse(f"{n} = None").body[0])

    cycle_prelude = [ast.parse("__cycle_state = __c.state").body[0]]
    if alarm_names:
        # channel-tagged alarms over run_node's single heap: remember
        # each channel's last fired value (the passive-read form)
        cycle_prelude.extend(ast.parse(
            "__alarm_last = __cycle_state.setdefault('__alarms', {})\n"
            "if __c.ticked('alarm'):\n"
            "    __alarm_last[__c.alarm[0]] = __c.alarm[1]"
        ).body)
    if is_basket_out:
        # basket output: csp.output({runtime_key: value}) accumulates
        # into the cycle's routed dict (channel mapping at wiring)
        cycle_prelude.append(ast.parse("__out = {}").body[0])
        cycle_prelude.append(
            ast.parse(
                "def __emit(__d):\n    __out.update(__d)\n    return None"
            ).body[0]
        )
    elif multi:
        cycle_prelude.append(ast.parse("__out = {}").body[0])
        cycle_prelude.append(
            ast.parse(
                "def __emit(**kw):\n    __out.update(kw)\n    return None"
            ).body[0]
        )
    else:
        # single unnamed output: csp.output(v) records v immediately;
        # execution continues and the cycle emits the recorded value
        # even without an explicit `return` (reference semantics)
        cycle_prelude.append(ast.parse("__out = [None]").body[0])
        cycle_prelude.append(
            ast.parse(
                "def __emit(__v):\n    __out[0] = __v\n    return __v"
            ).body[0]
        )
    for name in input_names:
        cycle_prelude.append(
            ast.parse(f"{name} = __wrap(__c[{_chan(name)!r}])").body[0]
        )
    for name in basket_names:
        cycle_prelude.append(
            ast.parse(
                f"{name} = __mk_basket(__c, __basket_channels[{name!r}])"
            ).body[0]
        )
    for name in scalar_names:
        cycle_prelude.append(
            ast.parse(f"{name} = __scalars[{name!r}]").body[0]
        )

    # csp.start() analog: a separate per-key function run by the
    # runner's synthetic pre-input cycle (noderun on_start) — inputs
    # are not yet valid there, matching the reference; cycle-relative
    # schedule_alarm calls anchor at that cycle's `now` (the engine
    # start time when wired inside csp.run)
    def _hook_body(rw_stmts) -> list[ast.stmt]:
        if not rw_stmts:
            return []
        out = [ast.parse("__cycle_state = __c.state").body[0]]
        if alarm_names:
            out.append(ast.parse(
                "__alarm_last = __cycle_state.setdefault('__alarms', {})"
            ).body[0])
        for name in scalar_names:
            out.append(
                ast.parse(f"{name} = __scalars[{name!r}]").body[0]
            )
        out.extend(rw_stmts)
        return out

    start_fn_body = _hook_body(_rewrite(start_stmts))
    # csp.stop() analog: a per-key finalizer run by the runner AFTER
    # trailing alarms (side effects + state reads, no output)
    stop_fn_body = _hook_body(_rewrite(stop_stmts))

    cycle_body = cycle_prelude + _rewrite(body)
    if multi or is_basket_out:
        cycle_body.append(ast.parse("return __out").body[0])
    else:
        # fall-through after a csp.output(v) statement still ticks v
        cycle_body.append(ast.parse("return __out[0]").body[0])

    def _fndef(name: str, fn_body: list[ast.stmt], argname: str | None):
        return ast.FunctionDef(
            name=name,
            args=ast.arguments(
                posonlyargs=[],
                args=[ast.arg(arg=argname)] if argname else [],
                kwonlyargs=[], kw_defaults=[], defaults=[],
            ),
            body=fn_body or [ast.parse("return {}").body[0]],
            decorator_list=[],
        )

    defs = [
        _fndef("__state_factory", init_body, None),
        _fndef("__node_cycle", cycle_body, "__c"),
    ]
    if start_fn_body:
        defs.append(_fndef("__node_start", start_fn_body, "__c"))
    if stop_fn_body:
        defs.append(_fndef("__node_stop", stop_fn_body, "__c"))
    mod = ast.Module(body=defs, type_ignores=[])
    ast.fix_missing_locations(mod)
    ns = dict(fn.__globals__)
    # a node defined inside a function closes over enclosing-scope
    # names (imports, helpers, constants) — the reference executes the
    # original function object so its closure just works; the AST
    # recompile must carry those cells into the exec namespace.
    # Documented delta: cells are SNAPSHOT at wiring time (the
    # reference reads them live at call time), so rebinding a freevar
    # after wiring — or wiring while a cell is still empty — uses the
    # wiring-time value / raises NameError at engine time
    if fn.__closure__:
        for name, cell in zip(fn.__code__.co_freevars, fn.__closure__):
            try:
                ns[name] = cell.cell_contents
            except ValueError:
                pass
    ns["__wrap"] = _wrap
    ns["__scalars"] = dict(scalars)
    ns["__mk_basket"] = _BasketView
    ns["__basket_channels"] = {
        k: dict(v) for k, v in (basket_channels or {}).items()
    }
    exec(compile(mod, f"<csp.node {fn.__name__}>", "exec"), ns)
    return (
        ns["__node_cycle"], ns["__state_factory"], ns.get("__node_start"),
        ns.get("__node_stop"), start_has_alarms, input_names,
        basket_names, scalar_names, multi, outputs, output_type,
        basket_out,
    )


def wire_reference_node(fn: Callable, *args: Any, **kwargs: Any):
    """Wire a reference-style node call: TickStream args become
    run_node inputs, scalars bake into the cycle closure; returns one
    TickStream (single output) or NodeOutputs (csp.Outputs)."""
    from .ticks import TickStream

    sig = inspect.signature(fn)
    bound = sig.bind(*args, **kwargs)
    bound.apply_defaults()

    def _is_basket_value(v) -> bool:
        if (
            isinstance(v, dict)
            and len(v) > 0
            and all(isinstance(s, TickStream) for s in v.values())
        ):
            return True
        # list basket ([ts[T]] annotation, e.g. the reference's
        # [csp.const(bit) for ...] wiring): position is the key
        return (
            isinstance(v, (list, tuple))
            and len(v) > 0
            and all(isinstance(s, TickStream) for s in v)
        )

    # dict/list baskets ({key: stream} or [stream, ...]): each member
    # becomes its own run_node channel, re-keyed to the global
    # key — a reference node is ONE instance observing every member,
    # so coincident member ticks share an engine cycle
    basket_channels: dict[str, dict[str, str]] = {}
    basket_streams: dict[str, TickStream] = {}
    for name, v in bound.arguments.items():
        if _is_basket_value(v):
            chans = {}
            items = v.items() if isinstance(v, dict) else enumerate(v)
            for i, (k, s) in enumerate(items):
                ch = f"{name}__b{i}"
                from pyspark.sql import functions as _F

                from .ticks import GLOBAL_KEY, KEY, SEQ, TS

                basket_streams[ch] = TickStream(
                    s.df.select(
                        _F.lit(GLOBAL_KEY).alias(KEY), TS, SEQ,
                        _F.col(s.value_col).alias("value"),
                    )
                )
                # dict keys arrive as the dynamic surface's string
                # keys; list baskets keep their integer positions so
                # x[0] / keys() match the reference
                chans[k if isinstance(v, (list, tuple)) else str(k)] = ch
            basket_channels[name] = chans

    scalars = {
        k: v for k, v in bound.arguments.items()
        if not isinstance(v, TickStream) and k not in basket_channels
    }
    (
        cycle, mk_state, on_start, on_stop, start_has_alarms,
        input_names, basket_names, scalar_names, multi, outputs,
        output_type, basket_out,
    ) = _compile_cycle(fn, scalars, basket_channels)
    for name in basket_names:
        if name not in basket_channels:
            raise TypeError(
                f"node basket input {name!r} expects a dict of "
                "TickStreams (e.g. a csp.dynamic basket)"
            )

    # engine start/end: the enclosing csp.run's bounds, when wiring
    # happens inside one — start anchors csp.start() alarm scheduling,
    # end bounds trailing alarms (a self-rescheduling node otherwise
    # runs to the safety cap, like an unbounded reference run)
    engine_start = engine_end = None
    try:
        from ..plans.runtime import engine_end_time, engine_start_time

        engine_start = engine_start_time()
        engine_end = engine_end_time()
    except Exception:
        pass
    if start_has_alarms and engine_start is None:
        raise NotImplementedError(
            "csp.schedule_alarm inside csp.start() anchors at engine "
            "start time — wire this node inside csp.run(..., "
            "starttime=...) so the runner knows it"
        )

    streams = {}
    for name in input_names:
        v = bound.arguments.get(name)
        if not isinstance(v, TickStream):
            raise TypeError(
                f"node input {name!r} expects a TickStream, got "
                f"{type(v).__name__}"
            )
        streams[_chan(name)] = v
    streams.update(basket_streams)

    from .noderun import run_node

    if basket_out is not None:
        # shape-declared basket output: one run_node channel per key
        # from the named scalar (OutputBasket(..., shape="keys")); the
        # cycle's runtime-keyed dict routes onto the channels, and the
        # wired result is a {key: stream} dict basket
        shape_name = basket_out.shape
        if shape_name not in bound.arguments:
            raise TypeError(
                f"OutputBasket shape argument {shape_name!r} is not a "
                "parameter of the node"
            )
        shape_keys = list(bound.arguments[shape_name])
        channels = {k: f"__bk{i}" for i, k in enumerate(shape_keys)}

        # element DDL: concrete ts[...] in the annotation, else infer
        # from the first ts input (the reference's "T" generic resolves
        # the same way — from the bound input's type)
        elem_ann = None
        targs = getattr(basket_out.typ, "__args__", None)
        if targs and len(targs) == 2:
            elem_ann = targs[1]
        elif isinstance(basket_out.typ, dict) and len(basket_out.typ) == 1:
            elem_ann = next(iter(basket_out.typ.values()))
        elem = getattr(elem_ann, "__csp_elem__", None)
        if isinstance(elem, type):
            elem_ddl = _elem_type(elem_ann)
        elif input_names:
            first = streams[_chan(input_names[0])]
            elem_ddl = dict(first.df.dtypes)[first.value_col]
        else:
            elem_ddl = "double"
        outs_schema = {ch: elem_ddl for ch in channels.values()}

        inner = cycle

        def cycle(c, __inner=inner, __ch=channels):  # noqa: F811
            r = __inner(c)
            if not r:
                return r
            out = {}
            for k, v in r.items():
                ch = __ch.get(k)
                if ch is None:
                    raise KeyError(
                        f"basket output key {k!r} is not in the "
                        f"declared shape {list(__ch)}"
                    )
                out[ch] = v
            return out

        res = run_node(
            cycle, streams, state=mk_state, outputs=outs_schema,
            on_start=on_start, on_stop=on_stop,
            start=engine_start, end=engine_end,
            seed_empty_start=start_has_alarms,
        )
        return {k: res[ch] for k, ch in channels.items()}

    if multi:
        res = run_node(
            cycle, streams, state=mk_state, outputs=outputs,
            on_start=on_start, on_stop=on_stop,
            start=engine_start, end=engine_end,
            seed_empty_start=start_has_alarms,
        )
        return NodeOutputs(res)
    out = run_node(
        cycle, streams, state=mk_state, output_type=output_type,
        on_start=on_start, on_stop=on_stop,
        start=engine_start, end=engine_end,
        seed_empty_start=start_has_alarms,
    )
    # a node with NO return annotation is a pure side-effect sink
    # (prints, external writes): the reference engine runs it because
    # it is wired — register it on the run frame so csp.run forces one
    # evaluation even though nothing consumes its (empty) output
    hints = _hints(fn)
    if hints.get("return") is None:
        try:
            from ..plans.runtime import _run_info_stack

            if _run_info_stack:
                _run_info_stack[-1].setdefault("sink_nodes", []).append(out)
        except Exception:
            pass
    return out
