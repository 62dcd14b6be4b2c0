package graft

import org.apache.logging.log4j.core.{Filter, LogEvent, LoggerContext}
import org.apache.logging.log4j.core.filter.AbstractFilter

/** Targeted log-noise suppression for the Verify/Bench mains.
  *
  * The scoped release ([[graft.operators.Materialize.scoped]])
  * deliberately unpersists locally-checkpointed RDDs at query exit;
  * Spark warns per block ("… was locally checkpointed, its lineage has
  * been truncated and cannot be recomputed after unpersisting") —
  * correct in general, pure noise here (nothing reads a checkpoint
  * after its query's scope closes; a 337-query dump emits thousands).
  *
  * The warning's logger is the CONCRETE RDD subclass
  * (MapPartitionsRDD, …), so no logger-name scoping can catch it
  * without muting a whole package's WARN signal (block removal /
  * recompute problems). A message-matching context filter denies
  * exactly this one message and stays NEUTRAL for everything else. */
object LogNoise {
  def muteUnpersistWarning(): Unit = {
    val deny = new AbstractFilter() {
      private def check(msg: String): Filter.Result =
        if (msg != null &&
            msg.contains("cannot be recomputed after unpersisting"))
          Filter.Result.DENY
        else Filter.Result.NEUTRAL
      override def filter(event: LogEvent): Filter.Result =
        check(event.getMessage.getFormattedMessage)
    }
    val ctx = LoggerContext.getContext(false)
    val cfg = ctx.getConfiguration
    // on every LoggerConfig (root included): an event is filtered by
    // the config of the logger that emitted it, so the root-level
    // filter alone would miss loggers with their own LoggerConfig
    (cfg.getLoggers.values().toArray
      .map(_.asInstanceOf[org.apache.logging.log4j.core.config.LoggerConfig])
      :+ cfg.getRootLogger)
      .foreach(_.addFilter(deny))
    ctx.updateLoggers()
  }
}
