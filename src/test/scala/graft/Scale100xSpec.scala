package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM pins for the scale-artifact merge policy: the artifact is the
  * round's committed 100× evidence, so what may and may not overwrite a
  * row is semantics worth a test, not a convention.
  */
class Scale100xSpec extends AnyFunSuite {

  private def art(rows: String) = Some(s"""{"heap_gb":32.0,"rows":{$rows}}""")
  private val passing =
    """"s07_100x":{"sec":45.2,"max_task_ms":4800,"load":"2.1","runs_s":[45.2,46.0],"unix":1}"""
  private val failingFresh =
    """"s07_100x":{"sec":64.7,"max_task_ms":9276,"load":"2.2","runs_s":[66.8,64.7]}"""
  private val passingFresh =
    """"s07_100x":{"sec":47.0,"max_task_ms":4100,"load":"2.3","runs_s":[47.0,48.1]}"""

  test("a fresh successful row replaces a committed one") {
    val (merged, n) = Scale100x.mergeRows(art(passing), s"{$passingFresh}", 99)
    assert(n == 1)
    assert(merged.contains("\"sec\":47.0") && merged.contains("\"unix\":99"))
    assert(!merged.contains("45.2"))
  }

  test("a bar-failing re-measure never evicts a bar-passing committed row") {
    val (merged, n) = Scale100x.mergeRows(art(passing), s"{$failingFresh}", 99)
    assert(n == 0)
    assert(merged.contains("\"sec\":45.2"))
    assert(!merged.contains("9276"))
  }

  test("a loud-machine re-measure never evicts a quiet committed row (r14)") {
    // the observed incident: a best run logged at loadavg 4.01 passed the
    // straggler bar and evicted a load-passing row — the merge now checks
    // the same quiet bar as tools/check_scale.py
    val loudFresh =
      """"s07_100x":{"sec":37.6,"max_task_ms":4684,"load":"4.01","runs_s":[56.5,37.6]}"""
    val (merged, n) = Scale100x.mergeRows(art(passing), s"{$loudFresh}", 99)
    assert(n == 0)
    assert(merged.contains("\"sec\":45.2"))
  }

  test("a bar-failing re-measure does replace a bar-failing committed row") {
    val committedFailing =
      """"s07_100x":{"sec":59.1,"max_task_ms":7488,"runs_s":[59.1,71.1],"unix":1}"""
    val (merged, n) =
      Scale100x.mergeRows(art(committedFailing), s"{$failingFresh}", 99)
    assert(n == 1)
    assert(merged.contains("\"sec\":64.7") && merged.contains("\"unix\":99"))
  }

  test("an error row never evicts a committed measurement") {
    val err = """"s07_100x":{"error":"ENOSPC","error_runs":2}"""
    val (merged, n) = Scale100x.mergeRows(art(passing), s"{$err}", 99)
    assert(n == 0)
    assert(merged.contains("\"sec\":45.2"))
  }

  test("a committed row with no load field keeps its seat against a bar-failing fresh row") {
    // rows merged from pre-load-field artifacts carry no "load"; treating
    // that as bar-failing would let a fresh row measured at loadavg 9
    // evict a legitimately-measured older one (ADVICE r14)
    val committedNoLoad =
      """"s07_100x":{"sec":45.2,"max_task_ms":4800,"runs_s":[45.2,46.0],"unix":1}"""
    val loudFresh =
      """"s07_100x":{"sec":37.6,"max_task_ms":4684,"load":"9.1","runs_s":[56.5,37.6]}"""
    val (merged, n) = Scale100x.mergeRows(art(committedNoLoad), s"{$loudFresh}", 99)
    assert(n == 0)
    assert(merged.contains("\"sec\":45.2"))
    // a FRESH row without a load field is still held to the bar: it must
    // not evict a fully-gated committed row
    val freshNoLoad =
      """"s07_100x":{"sec":37.6,"max_task_ms":4684,"runs_s":[56.5,37.6]}"""
    val (merged2, n2) = Scale100x.mergeRows(art(passing), s"{$freshNoLoad}", 99)
    assert(n2 == 0)
    assert(merged2.contains("\"sec\":45.2"))
  }

  test("a committed row with no max_task_ms keeps its seat against a bar-failing fresh row") {
    // same rationale as the missing-load leniency: never evict an older
    // measurement on a missing field (ADVICE r15 — the old default case
    // treated a committed row that predates max_task_ms as bar-failing,
    // so a bar-failing fresh row could still evict it)
    val committedNoTask =
      """"s07_100x":{"sec":45.2,"load":"2.1","runs_s":[45.2,46.0],"unix":1}"""
    val (merged, n) = Scale100x.mergeRows(art(committedNoTask), s"{$failingFresh}", 99)
    assert(n == 0)
    assert(merged.contains("\"sec\":45.2"))
    // a FRESH row without max_task_ms is still held to the bar
    val freshNoTask =
      """"s07_100x":{"sec":37.6,"load":"2.2","runs_s":[56.5,37.6]}"""
    val (merged2, n2) = Scale100x.mergeRows(art(passing), s"{$freshNoTask}", 99)
    assert(n2 == 0)
    assert(merged2.contains("\"sec\":45.2"))
  }

  test("warmMedian matches check_scale.py's recompute rule") {
    // the publishing rule lives in two languages (Bench.warmMedian writes
    // the row, check_scale.py recomputes from runs_s and fails on drift) —
    // this pins the Scala side on the cases that differ between rules:
    // run-1 exclusion, even-count averaging, single-run fallback
    assert(Bench.warmMedian(Seq(82.5, 22.7, 46.5, 27.6)) === 27.6)
    assert(Bench.warmMedian(Seq(12.7, 31.8, 17.2)) === (31.8 + 17.2) / 2)
    assert(Bench.warmMedian(Seq(62.476, 54.035, 47.956)) ===
      (54.035 + 47.956) / 2) // the s07_100x migration value
    assert(Bench.warmMedian(Seq(10.0, 7.0)) === 7.0)
    assert(Bench.warmMedian(Seq(9.9)) === 9.9)
  }

  test("a fresh row for a new key lands regardless of bars") {
    // first measurement of a row: even bar-failing, it is the only
    // evidence there is — the checker will flag it, not the merge
    val (merged, n) = Scale100x.mergeRows(art(passing),
      """{"d99_100x":{"sec":9.9,"max_task_ms":9000,"runs_s":[9.9,10.0]}}""", 99)
    assert(n == 1)
    assert(merged.contains("d99_100x") && merged.contains("\"sec\":45.2"))
  }
}
