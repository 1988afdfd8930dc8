package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A named query body: (session, scale-factor dir) => result.
    * Matches the driver contract in SparkEntry.scala:8-9. */
  type Q = (SparkSession, String) => DataFrame
}
