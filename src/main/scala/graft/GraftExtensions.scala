package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{ByteSurprisal, NfcNormalize, PyCapWords, PyCapitalize, PyTitle, VecDotLong}

/** Spark-native installation point for the engine's custom expressions:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * makes `vec_dot`, `py_title`, `py_capitalize`, `py_cap_words` available
  * in every session (including pure-SQL clients) without any per-session
  * registration call. The imperative `GraftFunctions.register` /
  * `PyText.register` paths remain for sessions created without the
  * extension.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotLong].getName, "vec_dot"),
      es => VecDotLong(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("py_title"),
      new ExpressionInfo(classOf[PyTitle].getName, "py_title"),
      es => PyTitle(es.head)))
    ext.injectFunction((FunctionIdentifier("py_capitalize"),
      new ExpressionInfo(classOf[PyCapitalize].getName, "py_capitalize"),
      es => PyCapitalize(es.head)))
    ext.injectFunction((FunctionIdentifier("py_cap_words"),
      new ExpressionInfo(classOf[PyCapWords].getName, "py_cap_words"),
      es => PyCapWords(es.head)))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      es => NfcNormalize(es.head)))
    ext.injectFunction((FunctionIdentifier("byte_surprisal"),
      new ExpressionInfo(classOf[ByteSurprisal].getName, "byte_surprisal"),
      es => ByteSurprisal(es.head)))
    // Rule tier: idempotence collapse for nfc_normalize chains
    ext.injectOptimizerRule(s => graft.plans.CollapseNfcNormalize(s))
    // Whole-operator tier: the native as-of join (logical node + merge exec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
