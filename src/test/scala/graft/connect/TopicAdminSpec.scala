package graft.connect

import org.scalatest.funsuite.AnyFunSuite

/** The B6 admin contract, behavior for behavior against
  * `sample_kafka_process.sh`: create is apply/upsert with the reference
  * manifest (1×1, delete policy), compacted create carries
  * `cleanup.policy=compact`, delete ignores not-found, reset
  * delete-then-creates and drops compaction (the script recreates via
  * plain create_topic), and empty names fail fast like the script's
  * `error "Topic name is required"`.
  */
class TopicAdminSpec extends AnyFunSuite {

  private def admin() = new TopicAdmin(new InMemoryTopicBackend)

  test("create → list → describe roundtrip with the reference manifest") {
    val a = admin()
    assert(a.listTopics().isEmpty)
    a.createTopic("events")
    a.createCompactedTopic("user-state")
    assert(a.listTopics().map(_.name) === Seq("events", "user-state"))
    val std = a.describe("events").get
    assert((std.partitions, std.replicas, std.compacted) === ((1, 1, false)))
    assert(std.config.isEmpty)
    val compacted = a.describe("user-state").get
    assert(compacted.config === Map("cleanup.policy" -> "compact"))
  }

  test("create is apply/upsert: re-creating an existing compacted topic " +
       "as standard replaces the spec (kubectl apply semantics)") {
    val a = admin()
    a.createCompactedTopic("t")
    a.createTopic("t")
    assert(a.listTopics().size === 1)
    assert(!a.describe("t").get.compacted)
  }

  test("delete ignores not-found and reports prior existence") {
    val a = admin()
    assert(!a.deleteTopic("ghost")) // absent: success, existed=false
    a.createTopic("t")
    assert(a.deleteTopic("t"))
    assert(!a.exists("t"))
  }

  test("reset recreates as STANDARD policy even from compacted " +
       "(reference recreates via plain create_topic)") {
    val a = admin()
    a.createCompactedTopic("t")
    val after = a.resetTopic("t")
    assert(!after.compacted && a.describe("t").exists(!_.compacted))
    // reset of an absent topic just creates it (delete ignored not-found)
    assert(!a.resetTopic("fresh").compacted && a.exists("fresh"))
  }

  test("argument validation fails fast: empty, reserved, illegal chars, " +
       "over-long names") {
    val a = admin()
    for (bad <- Seq("", ".", "..", "has space", "semi;colon", "x" * 250))
      intercept[IllegalArgumentException](a.createTopic(bad))
    // boundary: 249 chars and the full legal charset are accepted
    a.createTopic("x" * 249)
    a.createTopic("A-z.0_9")
    assert(a.listTopics().size === 2)
  }
}
