package graft.golden

import org.scalatest.funsuite.AnyFunSuite

/** Full golden-corpus parity: every case of every reference YAML family
  * (indexer/tests/test_cases YAMLs), run against the REAL trace
  * fixtures (tests/traces .lz4 dumps) through the production classifier, with
  * the reference's own assertion semantics
  * (tests/utils/generic_yaml_test.py:run_test_case — find exactly one
  * action per expected type/selector, then compare every pinned dot-path
  * value).
  *
  * This is the strongest field-level fidelity gate in the repo: the
  * inputs are the reference's captured mainnet traces, not synthesized
  * fixtures.
  */
class GoldenCorpusSpec extends AnyFunSuite {

  import scala.jdk.CollectionConverters._

  private def yamlCases(f: java.io.File): Seq[(String, Map[String, Any])] = {
    val y = new org.yaml.snakeyaml.Yaml()
    val root = y.load[java.util.Map[String, Any]](
      new java.io.FileInputStream(f))
    Option(root).flatMap(r => Option(r.get("cases"))) match {
      case Some(cs: java.util.Map[_, _]) =>
        cs.asInstanceOf[java.util.Map[String, Any]].asScala.toSeq.map {
          case (name, data) =>
            name -> data.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
        }
      case _ => Nil
    }
  }

  private def runCase(family: String, name: String,
      data: Map[String, Any]): Unit = {
    val traceId = String.valueOf(data("trace-id"))
    val loaded = GoldenCorpus.load(traceId)
    val actions = GoldenCorpus.classify(loaded)

    val expected = data.get("expected-actions").toSeq.flatMap {
      case l: java.util.List[_] =>
        l.asScala.toSeq.map(_.asInstanceOf[java.util.Map[String, Any]].asScala.toMap)
      case _ => Nil
    }
    assert(expected.nonEmpty, s"case '$name' has no expected-actions")

    expected.foreach { exp =>
      val typ = String.valueOf(exp("type"))
      var matching = actions.filter(_.`type`.equalsIgnoreCase(typ))
      exp.get("selector").map(String.valueOf).foreach { sel =>
        if (matching.nonEmpty) {
          val found = matching.find(a => YamlCheck.Selector.eval(sel, a))
          assert(found.isDefined,
            s"[$family/$name] no action of type $typ matches selector $sel; " +
              s"actions=${actions.map(_.`type`)}")
          matching = found.toList
        }
      }
      assert(matching.size == 1,
        s"[$family/$name] expected 1 action of type $typ, found " +
          s"${matching.size} (all: ${actions.map(_.`type`).sorted})")
      val action = matching.head
      val values = exp.get("values") match {
        case Some(m: java.util.Map[_, _]) =>
          m.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
        case _ => Map.empty[String, Any]
      }
      val failures = values.toList.flatMap { case (path, ev) =>
        YamlCheck.check(YamlCheck.nested(action, path), ev, path)
      }
      assert(failures.isEmpty,
        s"[$family/$name] action $typ mismatches:\n  " +
          failures.mkString("\n  "))
    }
  }

  if (GoldenCorpus.available) {
    val files = GoldenCorpus.CasesDir.listFiles()
      .filter(_.getName.endsWith(".yaml")).sortBy(_.getName)
    for (f <- files; (name, data) <- yamlCases(f)) {
      test(s"${f.getName}: $name") { runCase(f.getName, name, data) }
    }
  } else {
    ignore("golden corpus unavailable (reference checkout missing)") {}
  }
}
