"""JDBC source/sink: the production path for the reference's
MySQL->MySQL replication shape.

Reads partition on the tracking column (numPartitions/lowerBound/
upperBound) so a 100 TB table scans in parallel; writes use JDBC
``batchsize`` (the reference's InsertBatchSize, loader_default.go:12)
and isolation NONE for idempotent append targets.

``apply_cdc_txn`` is the live-database merge: the resolved batch is
staged via parallel batched INSERTs, then the dialect's merge runs
inside ONE driver-held JDBC transaction — the BEGIN/COMMIT-per-batch
semantics of /root/reference/loader_default.go:30-34. On MySQL/MariaDB
(the reference's actual target, no ANSI MERGE) the statements are the
reference's own pair: multi-table DELETE for removes + ``REPLACE INTO
... SELECT`` for the rest (batched_queries.go:21-23,28-74); everywhere
else they generalize to one standard SQL ``MERGE INTO``. A failure
rolls back, the runner never commits offsets, the batch replays.

Exercised end-to-end against embedded Apache Derby (bundled with
Spark's classpath) in tests/test_jdbc_e2e.py; the same code path works
against any server that speaks ANSI MERGE. Embedded Derby is
single-JVM — production targets are networked databases, where the
executor-parallel staging write + one server-side MERGE is exactly the
shape you want at scale (no per-row round trips).
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession


def _q(ident: str) -> str:
    """ANSI double-quote an identifier, matching Spark's JDBC writer
    quoting so staged column names resolve case-exactly."""
    return '"' + ident.replace('"', '""') + '"'


def _q_my(ident: str) -> str:
    """Backtick-quote an identifier — MySQL/MariaDB's default quoting
    (ANSI double quotes need sql_mode=ANSI_QUOTES there), matching what
    Spark's MySQL dialect writer creates."""
    return "`" + ident.replace("`", "``") + "`"


_SAFE_TABLE = re.compile(r"^[A-Za-z0-9_.]+$")


def _qt(table: str) -> str:
    """Render a table name for SQL interpolation.

    Plain names (letters/digits/underscore, optionally schema-dotted)
    pass through UNQUOTED — exactly how Spark's JDBC writer passes
    ``dbtable``, so the server's case-folding keeps matching tables
    those writers created. Anything else (spaces, punctuation, quotes)
    is ANSI-quoted per dotted part, which both closes the SQL-injection
    surface of raw interpolation and makes exotic names usable at all.
    Used consistently at creation AND reference, so the two always
    resolve to the same server-side identifier.
    """
    if _SAFE_TABLE.match(table):
        return table
    return ".".join(_q(p) for p in table.split("."))


def _qt_my(table: str) -> str:
    """MySQL-dialect table rendering: plain names pass through, exotic
    names are backtick-quoted per dotted part (see ``_qt``)."""
    if _SAFE_TABLE.match(table):
        return table
    return ".".join(_q_my(p) for p in table.split("."))


class JdbcSource:
    def __init__(self, url: str, batch_size: int = 1000, num_partitions: int = 32) -> None:
        self.url = url
        self.batch_size = batch_size
        self.num_partitions = num_partitions

    def reader_options(
        self,
        table: str,
        partition_column: str | None = None,
        lower: int | None = None,
        upper: int | None = None,
    ) -> dict[str, str]:
        opts = {"url": self.url, "dbtable": _qt(table), "fetchsize": str(self.batch_size)}
        if partition_column is not None:
            opts.update(
                partitionColumn=partition_column,
                lowerBound=str(lower or 0),
                upperBound=str(upper or 1),
                numPartitions=str(self.num_partitions),
            )
        return opts

    def writer_options(self, table: str) -> dict[str, str]:
        return {
            "url": self.url,
            "dbtable": _qt(table),
            "batchsize": str(self.batch_size),
            "isolationLevel": "NONE",
        }

    def table(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.format("jdbc").options(**self.reader_options(name)).load()

    def table_partitioned(
        self,
        spark: SparkSession,
        name: str,
        partition_column: str,
        lower: int,
        upper: int,
    ) -> DataFrame:
        """Parallel scan: ``num_partitions`` range-split WHERE clauses on
        the key column — how a big table is actually read at scale."""
        return (
            spark.read.format("jdbc")
            .options(**self.reader_options(name, partition_column, lower, upper))
            .load()
        )

    def exists(self, spark: SparkSession, name: str) -> bool:
        try:
            self.table(spark, name).schema
            return True
        except Exception:
            return False

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        df.write.format("jdbc").options(**self.writer_options(name)).mode(
            "append" if mode == "append" else "overwrite"
        ).save()

    # ------------------------------------------------- transactions

    def execute(self, spark: SparkSession, *statements: str, transactional: bool = True) -> None:
        """Run statements over one driver-side JDBC connection; with
        ``transactional`` they commit atomically (rollback on any
        failure). This is the loader's per-batch BEGIN/COMMIT
        (loader_default.go:30-34)."""
        conn = spark._jvm.java.sql.DriverManager.getConnection(self.url)
        try:
            conn.setAutoCommit(not transactional)
            st = conn.createStatement()
            try:
                for s in statements:
                    st.execute(s)
            finally:
                st.close()
            if transactional:
                conn.commit()
        except Exception:
            if transactional:
                try:
                    conn.rollback()
                except Exception:
                    pass
            raise
        finally:
            conn.close()

    def append_txn(self, spark: SparkSession, table: str, df: DataFrame) -> None:
        """Atomic batch append: stage with executor-parallel batched
        INSERTs (the staging table is throwaway — a partial staging
        failure just re-stages on replay), then commit ONE server-side
        ``INSERT INTO target SELECT FROM stage``. Spark's own JDBC
        append commits per task, so a mid-batch executor failure leaves
        a partially-written target and the replay duplicates rows; this
        path gives the reference's one-transaction-per-batch guarantee
        (loader_default.go:30-34) without moving data through the
        driver."""
        stage = f"{table}_stg_{uuid.uuid4().hex[:8]}"
        self.write(df, stage, mode="overwrite")
        cols = ", ".join(_q(c) for c in df.columns)
        try:
            self.execute(
                spark,
                f"INSERT INTO {_qt(table)} ({cols}) SELECT {cols} FROM {_qt(stage)}",
                transactional=True,
            )
        finally:
            try:
                self.execute(spark, f"DROP TABLE {_qt(stage)}", transactional=False)
            except Exception:
                pass

    def apply_cdc_txn(
        self,
        spark: SparkSession,
        table: str,
        batch: DataFrame,
        key_cols: list[str],
        method_col: str = "_method",
        remove_method: str = "REMOVE",
        null_cols: list[str] | None = None,
    ) -> None:
        """Apply a per-key-resolved CDC batch (data columns +
        ``method_col``) to a live JDBC table.

        ``null_cols``: target columns the batch no longer carries
        (dropped source columns). REPLACE semantics are full-row
        replacement (MySQL REPLACE INTO = delete + reinsert,
        batched_queries.go:21-23), so matched updates SET these to NULL
        — without this, a replica loaded via JDBC would retain stale
        pre-drop values where the parquet loaders (which rebuild the
        full row) null them, and the two replicas of one CDC stream
        would diverge by loader.

        1. stage: executors write the batch to a throwaway table with
           batched INSERTs (parallel, ``batchsize``-chunked);
        2. one transaction: a single ANSI ``MERGE INTO`` with refined
           WHEN clauses — matched REMOVE rows DELETE, matched others
           UPDATE, unmatched non-REMOVE rows INSERT (the source must be
           a base table, hence staging rather than a subquery);
        3. drop the staging table.

        The merge itself runs server-side — no per-row round trips, no
        table-sized data movement through Spark. The reference's
        REPLACE INTO / DELETE pair (batched_queries.go:21-23,28-74) is
        exactly this with MySQL's nonstandard upsert syntax.
        """
        stage = f"{table}_stg_{uuid.uuid4().hex[:8]}"
        self.write(batch, stage, mode="overwrite")
        stmts = self.cdc_statements(
            table,
            stage,
            list(batch.columns),
            key_cols,
            method_col=method_col,
            remove_method=remove_method,
            null_cols=null_cols,
        )
        try:
            self.execute(spark, *stmts, transactional=True)
        finally:
            try:
                self.execute(spark, f"DROP TABLE {_qt(stage)}", transactional=False)
            except Exception:
                pass

    @property
    def _is_mysql(self) -> bool:
        return self.url.startswith(("jdbc:mysql:", "jdbc:mariadb:"))

    def cdc_statements(
        self,
        table: str,
        stage: str,
        batch_cols: list[str],
        key_cols: list[str],
        method_col: str = "_method",
        remove_method: str = "REMOVE",
        null_cols: list[str] | None = None,
    ) -> list[str]:
        """The per-batch CDC SQL, dialect-refracted (pure text — unit
        testable without a server).

        ANSI arm (default; proven live vs Derby): one ``MERGE INTO``
        whose refined WHEN clauses DELETE matched REMOVE rows, UPDATE
        matched others, INSERT unmatched non-REMOVE rows.

        MySQL/MariaDB arm: the server has no MERGE — emit the
        reference's OWN statement pair (batched_queries.go:21-23,
        28-74): a multi-table ``DELETE t FROM ... JOIN stage`` for the
        REMOVE rows, then ``REPLACE INTO ... SELECT`` for the rest.
        REPLACE's delete-then-reinsert is exactly full-row replacement,
        so dropped source columns (``null_cols``) revert to column
        defaults (NULL) with no explicit SET — semantics identical to
        the MERGE arm's ``SET col = NULL``.

        CAVEAT (ADVICE r5 #5): "identical" holds only while every
        target column is either in ``batch_cols`` or listed in
        ``null_cols`` with a NULL default. A target column OUTSIDE the
        batch (out-of-band schema evolution, or a non-NULL column
        default) diverges: REPLACE resets it to its column default,
        while MERGE's UPDATE (which SETs only non-keys + null_cols)
        preserves the existing value. This full-row-replacement
        semantic is the reference's own (batched_queries.go REPLACE
        INTO); callers needing column-scoped updates on MySQL should
        evolve the batch schema first (pipeline/loaders.py does) or
        swap the second statement for INSERT ... ON DUPLICATE KEY
        UPDATE over the batch columns.

        Both statements run inside the caller's single transaction
        (InnoDB DML is transactional; only DDL auto-commits).
        Identifiers use backticks — MySQL's default quoting, matching
        what Spark's MySQL dialect writer creates — via ``_q_my``.

        Execution status (re-checked round 6): this container ships no
        MySQL-protocol engine (no mysqld/mariadbd binary, no client
        lib), so this arm remains TEXT-ASSERTED
        (tests/test_jdbc_dialects) while the ANSI arm is executed
        end-to-end against embedded Derby. Environment-blocked, not a
        code gap — the first live MySQL endpoint upgrades it by
        running the same loader tests with a mysql:// URL.
        """
        data_cols = [c for c in batch_cols if c != method_col]
        non_keys = [c for c in data_cols if c not in key_cols]
        dropped = [c for c in (null_cols or []) if c not in data_cols]
        if self._is_mysql:
            on = " AND ".join(f"t.{_q_my(k)} = s.{_q_my(k)}" for k in key_cols)
            cols = ", ".join(_q_my(c) for c in data_cols)
            m = f"s.{_q_my(method_col)}"
            return [
                f"DELETE t FROM {_qt_my(table)} t JOIN {_qt_my(stage)} s ON {on} "
                f"WHERE {m} = '{remove_method}'",
                f"REPLACE INTO {_qt_my(table)} ({cols}) "
                f"SELECT {cols} FROM {_qt_my(stage)} s "
                f"WHERE {m} <> '{remove_method}'",
            ]
        on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in key_cols)
        set_clause = ", ".join(
            [f"{_q(c)} = s.{_q(c)}" for c in non_keys]
            + [f"{_q(c)} = NULL" for c in dropped]
        )
        ins_cols = ", ".join(_q(c) for c in data_cols)
        ins_vals = ", ".join(f"s.{_q(c)}" for c in data_cols)
        # table names render via _qt: plain names pass through unquoted
        # (Spark dbtable parity, server case-folding intact), exotic
        # names are ANSI-quoted at creation and reference alike; COLUMN
        # names are always quoted, exactly as Spark's writer creates them
        # CAST: some dialects (Derby) store StringType as CLOB, which
        # cannot compare against a CHAR literal directly
        mcol = f"CAST(s.{_q(method_col)} AS VARCHAR(32))"
        not_remove = f"{mcol} <> '{remove_method}'"
        is_remove = f"{mcol} = '{remove_method}'"
        return [
            f"MERGE INTO {_qt(table)} t USING {_qt(stage)} s ON {on} "
            f"WHEN MATCHED AND {is_remove} THEN DELETE "
            + (
                f"WHEN MATCHED AND {not_remove} THEN UPDATE SET {set_clause} "
                if set_clause
                else ""
            )
            + f"WHEN NOT MATCHED AND {not_remove} "
            f"THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        ]

    def evolve_schema(self, spark: SparkSession, table: str, batch: DataFrame) -> list[str]:
        """Additive schema evolution on the live table: ALTER TABLE ADD
        COLUMN for every batch column the table lacks, typed exactly as
        Spark's own JDBC writer would create it (the dialect's type
        mapping, falling back to the common JDBC type) so evolved and
        freshly-created columns are indistinguishable server-side.
        Existing rows read NULL/DEFAULT. Returns the added column names.

        Dropped/missing batch columns need no DDL — the MERGE/INSERT
        simply doesn't set them. Type CHANGES are not handled here;
        operators/load.align_schemas raises on those before any SQL
        runs (destructive retypes are a human decision).

        Atomicity (ADVICE r4 #4): DDL auto-commits on MySQL/MariaDB —
        wrapping several ALTERs in a transaction does NOT make them
        all-or-nothing there. For those dialects we emit ONE statement
        with multiple ADD COLUMN clauses (natively atomic: one ALTER =
        one table rebuild). Elsewhere the per-statement transactional
        path is all-or-nothing only on engines with transactional DDL
        (Derby, Postgres); a mid-sequence failure on a non-transactional
        engine can leave a column subset, which a retry heals because
        the column diff is recomputed from the live table each call.
        """
        existing = {f.name for f in self.table(spark, table).schema.fields}
        to_add = [f for f in batch.schema.fields if f.name not in existing]
        if not to_add:
            return []
        jvm = spark._jvm
        dialect = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(self.url)
        stmts = []
        for f in to_add:
            jdt = jvm.org.apache.spark.sql.types.DataType.fromJson(f.dataType.json())
            opt = dialect.getJDBCType(jdt)
            jt = (
                opt.get()
                if opt.isDefined()
                else jvm.org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils.getCommonJDBCType(jdt).get()
            )
            stmts.append(
                f"ALTER TABLE {(_qt_my if self._is_mysql else _qt)(table)} "
                f"ADD COLUMN {(_q_my if self._is_mysql else _q)(f.name)} "
                f"{jt.databaseTypeDefinition()}"
            )
        if self._is_mysql and len(stmts) > 1:
            # MySQL/MariaDB: DDL auto-commits, so collapse to ONE
            # multi-clause ALTER — natively all-or-nothing
            adds = ", ".join(
                "ADD COLUMN " + s.split(" ADD COLUMN ", 1)[1] for s in stmts
            )
            stmts = [f"ALTER TABLE {_qt_my(table)} {adds}"]
        self.execute(spark, *stmts, transactional=True)
        return [f.name for f in to_add]
