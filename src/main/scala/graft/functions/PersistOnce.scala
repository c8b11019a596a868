package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.storage.StorageLevel

/**
 * Persist a DataFrame only if its (normalized) plan isn't already in the
 * session cache. Two inventory queries sharing an operator-internal persist of
 * the SAME input plan (e.g. percentiles + histogram over one column) would
 * otherwise re-persist it, tripping CacheManager's "Asked to cache already
 * cached data" warning and re-pinning storage. Lives under the spark.sql
 * package to reach the private[sql] CacheManager lookup.
 */
object PersistOnce {
  def apply(df: DataFrame,
            level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val session = df.sparkSession
    if (session.sharedState.cacheManager.lookupCachedData(df).isEmpty) df.persist(level)
    else df
  }
}
