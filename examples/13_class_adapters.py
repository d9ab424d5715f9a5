"""The reference's class-shaped adapter surfaces, end to end: a
DBReader over a sqlite table (TimestampAccessor window + symbol
subscribe), a CSVReader with the YYYYMMDD time formatter, and a
KafkaAdapterManager decoding a JSON wire frame — the same program
shapes reference users run today (csp/adapters/{db,csv,kafka}.py).

Run: python examples/13_class_adapters.py
"""
import datetime as dt
import json
import os
import sqlite3
import sys
import tempfile

sys.path.insert(0, ".")

import csp_spark

csp_spark.enable_reference_alias()
import csp
from csp.adapters.csv import CSVReader, YYYYMMDD_TIME_formatter
from csp.adapters.db import DBReader, TimestampAccessor
from csp.adapters.kafka import KafkaAdapterManager
from csp.adapters.utils import JSONTextMessageMapper

START = dt.datetime(2020, 1, 1)


class Price(csp.Struct):
    price: float
    size: int


def main() -> None:
    spark = csp_spark.get_spark(app_name="ex_class_adapters")
    spark.sparkContext.setLogLevel("ERROR")

    # ------------------------------------------------ DBReader (sqlite)
    conn = sqlite3.connect(":memory:")
    conn.execute(
        "CREATE TABLE prices (ts TEXT, symbol TEXT, price REAL, size INT)"
    )
    conn.executemany("INSERT INTO prices VALUES (?,?,?,?)", [
        ("2020-01-01 09:30:00", "AAPL", 100.0, 10),
        ("2020-01-01 09:31:00", "AAPL", 101.0, 20),
        ("2020-01-01 09:32:00", "IBM", 50.0, 5),
        ("2020-01-02 09:30:00", "AAPL", 102.0, 30),
    ])
    conn.commit()

    def db_graph():
        reader = DBReader.create_from_connection(
            conn,
            TimestampAccessor("ts", tz="UTC"),
            table_name="prices",
            symbol_column="symbol",
        )
        return {"aapl": reader.subscribe("AAPL", Price)}

    res = csp.run(
        db_graph, starttime=START, endtime=START + dt.timedelta(days=1)
    )
    print("DBReader AAPL day-1 ticks:")
    for t, v in res["aapl"]:
        print(f"  {t}  price={v.price} size={v.size}")
    assert [v.price for _, v in res["aapl"]] == [100.0, 101.0]

    # ------------------------------------------------ CSVReader
    path = os.path.join(tempfile.mkdtemp(), "ticks.csv")
    with open(path, "w") as f:
        f.write("time,symbol,price,size\n")
        f.write("20200101 09:30:00,AAPL,100.0,10\n")
        f.write("20200101 09:31:00,IBM,50.0,5\n")
        f.write("20200101 09:32:00,AAPL,101.5,20\n")
    reader = CSVReader(
        path, YYYYMMDD_TIME_formatter("time"), symbol_column="symbol"
    )
    ticks = reader.subscribe("AAPL", Price).collect_ticks("AAPL")
    print("CSVReader AAPL ticks:", [(str(t), v.price) for t, v in ticks])
    assert [v.price for _, v in ticks] == [100.0, 101.5]

    # ------------------------------------- KafkaAdapterManager (wire)
    # source_df injects a batch frame with the Kafka wire schema; the
    # decode plan is identical to the real readStream's
    wire = spark.createDataFrame(
        [
            (b"k1", json.dumps({"price": 1.5, "size": 3}).encode(),
             "trades", 0, 0, START),
            (b"k1", json.dumps({"price": 2.5, "size": 4}).encode(),
             "trades", 0, 1, START + dt.timedelta(minutes=1)),
            (b"k2", json.dumps({"price": 9.0, "size": 1}).encode(),
             "trades", 1, 0, START + dt.timedelta(minutes=2)),
        ],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )
    mgr = KafkaAdapterManager("broker:9092", source_df=wire)
    st = mgr.subscribe(Price, JSONTextMessageMapper(), "trades", key="k1")
    out = st.collect_ticks("k1")
    print("Kafka k1 ticks:", [(str(t), v.price, v.size) for t, v in out])
    assert [v.price for _, v in out] == [1.5, 2.5]
    frames = mgr.publish(JSONTextMessageMapper(), "out", "size", st).collect()
    print("Kafka publish wire:", [(r.key, r.value) for r in frames])
    assert [r.key for r in frames] == ["3", "4"]

    # --------------------------- runtime halves (r11): the SUBCLASS path
    # reference programs that customize CSVReaderImpl/DBReaderImpl port
    # unchanged — the managed-sim timeslice loop drives them
    from csp.adapters.csv import CSVReadAdapter, CSVReaderImpl

    class DollarizeImpl(CSVReaderImpl):
        def process_row(self, row):
            row = dict(row, price=float(row["price"]) * 100)  # cents->$
            super().process_row(row)

    class DollarizeReader(CSVReader):
        def _create(self, engine, memo):
            return DollarizeImpl(engine, self)

    def g():
        r = DollarizeReader(path, YYYYMMDD_TIME_formatter("time"),
                            symbol_column="symbol")
        return {"x": CSVReadAdapter(r, "AAPL", Price)}

    res = csp.run(g, starttime=START, endtime=START + dt.timedelta(days=1))
    print("subclassed CSVReaderImpl:", [v.price for _, v in res["x"]])
    assert [v.price for _, v in res["x"]] == [10000.0, 10150.0]

    # --------------------- partitioned JDBC read (r11, embedded Derby)
    # at scale, num_partitions=N turns the one-cursor read into N
    # concurrent range-bracketed scans; SEQ derives from row data so
    # (ts, seq) order is independent of the partition layout
    derby = tempfile.mkdtemp()
    url = f"jdbc:derby:{derby}/exdb;create=true"
    jconn = spark._jvm.java.sql.DriverManager.getConnection(url)
    cur = jconn.createStatement()
    cur.execute("CREATE TABLE trades (ts TIMESTAMP, symbol VARCHAR(8), "
                "price DOUBLE, size INTEGER)")
    for i in range(12):
        t = (START + dt.timedelta(minutes=i)).isoformat(sep=" ")
        cur.execute(f"INSERT INTO trades VALUES (TIMESTAMP('{t}'), "
                    f"'AAPL', {100.0 + i}, {i})")
    jconn.commit()
    reader = DBReader(
        url, TimestampAccessor("ts", tz="UTC"),
        table_name="trades", symbol_column="symbol",
        num_partitions=4,
        lower_bound=START, upper_bound=START + dt.timedelta(minutes=11),
    )
    stream = reader.subscribe("AAPL", Price)
    print("partitioned JDBC read:", stream.df.rdd.getNumPartitions(),
          "partitions,", stream.df.count(), "rows")
    assert stream.df.rdd.getNumPartitions() == 4

    print("OK")


if __name__ == "__main__":
    main()
