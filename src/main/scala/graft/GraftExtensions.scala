package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: enables the engine's native SQL
  * functions in any session via
  * `spark.sql.extensions=graft.GraftExtensions` (cluster config) or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.GraftFunctions.functions.foreach(ext.injectFunction)
    // declarative HOF dot-product folds → native codegen'd array_dot
    ext.injectOptimizerRule(_ => functions.RewriteArrayDot)
  }
}
