package graft

import graft.model.Schemas

/** §1.3: typed Dataset access to the fixed-schema core. */
class SchemasSpec extends SparkSpec {
  test("events reads as a typed Dataset[Event] with sane values") {
    val ds = Schemas.events(spark, "/root/testdata/sf0.001")
    val first = ds.head()
    assert(first.ts != null)
    assert(Set("purchase", "view", "signup", "error", "click")
      .contains(first.event_type) || first.event_type.nonEmpty)
    assert(ds.filter((e: graft.model.Event) => e.value >= 0).count() > 0)
  }
}
