"""Reference csp programs running UNMODIFIED.

The @csp.node AST translator (csp_spark/core/nodeparse.py) lowers the
reference's node grammar — ``with csp.state():`` blocks,
``csp.ticked/valid/output`` — onto the imperative node runner, and the
compat layer (core/refcompat.py) accepts the reference's
engine-ambient signatures (csp.const(1.0), csp.curve(float, [...]),
csp.print(tag, x)). One call is the ONLY bridge:

    import csp_spark
    csp_spark.enable_reference_alias()   # import csp -> csp_spark

(an import hook, so csp.* SUBMODULE imports — csp.adapters.parquet,
csp.utils.datetime — resolve to the same class objects too)

After that, reference source runs as-is — this example executes the
reference README's bid/ask program (inline below, verbatim) and, when
a reference checkout is present, examples/01_basics/e4_trade_pnl.py
straight from disk.

Run: python examples/10_reference_verbatim.py
"""
import datetime as dt
import os
import sys

sys.path.insert(0, ".")

import csp_spark

csp_spark.enable_reference_alias()

import csp  # noqa: E402  (the alias — reference imports now resolve)
from csp import ts  # noqa: E402


# --- the reference README program, verbatim -------------------------
@csp.node
def spread(bid: ts[float], ask: ts[float]) -> ts[float]:
    if csp.valid(bid, ask):
        return ask - bid


@csp.graph
def my_graph():
    bid = csp.const(1.0)
    ask = csp.const(2.0)
    s = spread(bid, ask)

    csp.print("spread", s)
    csp.print("bid", bid)
    csp.print("ask", ask)


def main() -> None:
    spark = csp_spark.get_spark(app_name="ex_verbatim")
    spark.sparkContext.setLogLevel("ERROR")

    print("== README bid/ask, verbatim ==")
    csp.run(my_graph, starttime=dt.datetime(2020, 1, 1))

    for ref in (
        "/root/reference/examples/01_basics/e4_trade_pnl.py",
        "/root/reference/examples/01_basics/e5_retail_cart.py",
    ):
        if os.path.exists(ref):
            print(f"== {os.path.basename(ref)}, executed from the "
                  "reference checkout ==")
            ns = {"__name__": os.path.basename(ref)[:-3]}
            exec(compile(open(ref).read(), ref, "exec"), ns)
            csp.run(ns["my_graph"], starttime=dt.datetime(2020, 1, 1))
        else:
            print(f"(reference checkout not present — skipping {ref})")


if __name__ == "__main__":
    main()
