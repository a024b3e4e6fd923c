package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession

/** Test-support bridge into the `private[sql]` CacheManager: library
  * operators must not pin plans in the session cache (the repo's
  * localCheckpoint-not-cache rule), and the regression test needs to
  * OBSERVE that. Read-only, one call. */
object CacheProbe {
  def isEmpty(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}
