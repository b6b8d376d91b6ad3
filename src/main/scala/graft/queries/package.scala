package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A named query: (session, scale-factor dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** One registry entry: name, Spark implementation, optional DuckDB oracle
    * SQL computing the same result over the same parquet tables. Oracle
    * contract (driver compare): same column NAMES, deterministic row order
    * (every query ends in a full ORDER BY), doubles rounded so fp
    * summation-order noise can't flip a hash.
    */
  final case class Entry(name: String, q: Q, oracle: Option[String])
}
