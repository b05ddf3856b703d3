"""``python -m rdbms_scala_spark`` — interactive SQL REPL.

Drop-in for the reference's entry point (Microbase.scala:942-949):
reads one SQL statement per line from stdin, prints pipe-delimited
rows. The reference's sample DDL works verbatim, e.g.::

    CREATE TABLE R (bar int, baz int) USING csv OPTIONS(path 'R.data', delimiter '|')
    SELECT bar, bar * 15 as biz, baz FROM R ORDER BY bar asc, baz asc limit 10
"""

from rdbms_scala_spark.engine import Engine
from rdbms_scala_spark.session import get_spark


def main() -> None:
    engine = Engine(get_spark("rdbms_scala_spark-repl"))
    engine.repl()


if __name__ == "__main__":
    main()
