package graft.util

import org.apache.logging.log4j.Level
import org.scalatest.funsuite.AnyFunSuite

/** The hierarchical-logger twin (…/pyspark_stream/utils/logger.py:5-60):
  * one framework namespace, child loggers by component name, levels that
  * inherit from the base unless overridden per child, and no duplicated
  * configuration on repeated gets.
  */
class LogSpec extends AnyFunSuite {

  test("hierarchical naming under the framework namespace (logger.py:24-27)") {
    assert(Log.logger.getName === "graft")
    assert(Log.logger("pipeline").getName === "graft.pipeline")
    // grandchild loggers nest further (logger.py example usage)
    assert(Log.logger("pipeline.sink").getName === "graft.pipeline.sink")
  }

  test("repeated gets return the same logger instance (logger.py:40-53 " +
       "no-duplicate-handler guarantee)") {
    assert(Log.logger("same") eq Log.logger("same"))
    assert(Log.logger eq Log.logger)
  }

  test("per-child level override applies to that child only (logger.py:66-74)") {
    val leveled = Log.logger("leveled", Level.DEBUG)
    assert(leveled.getLevel === Level.DEBUG)
    // a sibling without an override keeps inheriting — it must NOT have
    // picked up the sibling's DEBUG
    assert(Log.logger("plain").getLevel !== Level.DEBUG)
  }

  test("base-level set propagates to children without overrides (logger.py:57-58)") {
    Log.setLevel(Level.WARN)
    try assert(Log.logger("inheriting").getLevel === Level.WARN)
    finally Log.setLevel(Level.ERROR)
  }
}
