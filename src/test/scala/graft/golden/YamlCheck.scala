package graft.golden

/** Dot-path access + comparison semantics replicating the reference's
  * tests/utils/generic_yaml_test.py:
  *
  *   - get_nested_value: dot paths with `[n]` array indexing over the
  *     action rows (here: Scala case classes via Product reflection;
  *     Option is transparent — None reads as null).
  *   - check_value: jinja-selector strings, list compare (same length +
  *     every expected item matches SOME actual item), dict compare
  *     (recursive on keys), else direct equality.
  *
  * Equality is normalized across representations: numbers compare
  * numerically (our detail structs keep query ids as strings and amounts
  * as BigDecimal; YAML pins plain ints), addresses compare
  * case-insensitively (raw form `wc:hex`), opcodes compare on the
  * unsigned 32-bit value.
  */
object YamlCheck {

  private val indexRe = """(.+?)\[(\d+)\](.*)""".r
  private val addrRe = """(?i)-?\d+:[0-9A-F]{64}""".r

  // ---- value access ----

  private def fieldOf(obj: Any, name: String): Option[Any] = obj match {
    case null => None
    case mp: Map[_, _] =>
      mp.asInstanceOf[Map[String, Any]].get(name)
    case p: Product =>
      val idx = p.productElementNames.indexOf(name)
      if (idx < 0) None else Some(p.productElement(idx))
    case _ => None
  }

  private def unwrap(v: Any): Any = v match {
    case Some(x) => unwrap(x)
    case None => null
    case other => other
  }

  /** get_nested_value analogue (generic_yaml_test.py:17-64). Returns
    * None when the path is missing (vs Some(null) for an explicit null
    * value — both compare equal to YAML null, matching the reference's
    * get-with-None-default behavior). */
  def nested(obj: Any, path: String): Any = {
    val o = unwrap(obj)
    if (path.isEmpty) return o
    val (key, rest) = path.indexOf('.') match {
      case -1 => (path, "")
      case i => (path.substring(0, i), path.substring(i + 1))
    }
    key match {
      case indexRe(k, idx, remaining) =>
        val arr = unwrap(fieldOf(o, k).map(unwrap).orNull)
        arr match {
          case s: Seq[_] if s.length > idx.toInt =>
            val item = s(idx.toInt)
            val tail = Seq(remaining, rest).filter(_.nonEmpty).mkString(".")
            nested(item, tail)
          case _ => null
        }
      case k =>
        val v = unwrap(fieldOf(o, k).map(unwrap).orNull)
        if (rest.isEmpty) v else nested(v, rest)
    }
  }

  // ---- normalized equality ----

  private def asNumber(v: Any): Option[BigDecimal] = v match {
    case null => None
    case b: Boolean => None
    case b: java.lang.Boolean => None
    case i: Int => Some(BigDecimal(i))
    case l: Long => Some(BigDecimal(l))
    case l: java.lang.Long => Some(BigDecimal(l.longValue))
    case i: java.lang.Integer => Some(BigDecimal(i.intValue))
    case d: java.lang.Double => Some(BigDecimal(java.math.BigDecimal.valueOf(d.doubleValue)))
    case d: Double => Some(BigDecimal(java.math.BigDecimal.valueOf(d)))
    case b: BigInt => Some(BigDecimal(b))
    case b: BigDecimal => Some(b)
    case b: java.math.BigDecimal => Some(BigDecimal(b))
    case b: java.math.BigInteger => Some(BigDecimal(b))
    case s: String => scala.util.Try(BigDecimal(s.trim)).toOption
    case _ => None
  }

  def eqNorm(actual: Any, expected: Any): Boolean = {
    val a = unwrap(actual)
    val e = unwrap(expected)
    if (a == null || e == null) return a == null && e == null
    (asNumber(a), asNumber(e)) match {
      case (Some(x), Some(y)) =>
        x.compare(y) == 0 || {
          // opcodes: signed int32 storage vs unsigned YAML literals —
          // fold both to the unsigned 32-bit value when in range
          val lo = BigDecimal(Int.MinValue); val hi = BigDecimal(0xffffffffL)
          def u32(n: BigDecimal): Option[BigInt] =
            if (n.isWhole && n >= lo && n <= hi)
              Some(n.toBigInt & BigInt(0xffffffffL)) else None
          (u32(x), u32(y)) match {
            case (Some(ux), Some(uy)) => ux == uy
            case _ => false
          }
        }
      case _ =>
        val as = String.valueOf(a)
        val es = String.valueOf(e)
        if (as == es) true
        else (a, e) match {
          case (_: Boolean | _: java.lang.Boolean, s: String) =>
            as.equalsIgnoreCase(s)
          case _ =>
            // raw addresses compare case-insensitively (the reference
            // lowercases AccountAddress on access)
            addrRe.matches(as) && addrRe.matches(es) && as.equalsIgnoreCase(es)
        }
    }
  }

  // ---- check_value (generic_yaml_test.py:89-120) ----

  final case class CheckFailure(path: String, expected: Any, actual: Any,
      detail: String = "") {
    override def toString: String =
      s"at '$path': expected=$expected actual=$actual $detail"
  }

  def check(actual: Any, expected: Any, path: String): List[CheckFailure] = {
    val e = expected
    e match {
      case s: String if s.trim.startsWith("{{") && s.trim.endsWith("}}") =>
        if (Selector.eval(s, actual)) Nil
        else List(CheckFailure(path, s, unwrap(actual), "(selector)"))
      case lst: java.util.List[_] =>
        check(actual, lst.toArray.toList, path)
      case lst: Seq[_] =>
        unwrap(actual) match {
          case act: Seq[_] =>
            val lenOk = act.length == lst.length
            val missing = lst.filterNot(exp =>
              act.exists(a => check(a, exp, path).isEmpty))
            (if (lenOk) Nil
             else List(CheckFailure(path, s"list len ${lst.length}",
               s"list len ${act.length}"))) ++
              missing.map(exp => CheckFailure(path, exp, act, "(no list item matches)"))
          case other =>
            List(CheckFailure(path, s"list ${lst}", other))
        }
      case mp: java.util.Map[_, _] =>
        val sm = {
          val b = Map.newBuilder[String, Any]
          mp.forEach((k, v) => b += (String.valueOf(k) -> v))
          b.result()
        }
        check(actual, sm, path)
      case mp: Map[_, _] =>
        val a = unwrap(actual)
        if (a == null)
          List(CheckFailure(path, s"dict ${mp.asInstanceOf[Map[String,Any]].keys.mkString(",")}", null))
        else mp.asInstanceOf[Map[String, Any]].toList.flatMap { case (k, nv) =>
          val np = if (path.isEmpty) k else s"$path.$k"
          fieldOf(a, k) match {
            case None => List(CheckFailure(np, nv, "<missing key>"))
            case Some(av) => check(unwrap(av), nv, np)
          }
        }
      case _ =>
        if (eqNorm(actual, e)) Nil
        else List(CheckFailure(path, e, unwrap(actual)))
    }
  }

  /** Tiny evaluator for the jinja selector subset the YAMLs use:
    * `value.<path> ==|!= <literal>` joined by and/or, plus
    * `value.<path>|length == <n>`. Literals: 'str', numbers (0x hex
    * allowed), None. */
  object Selector {

    def eval(expr: String, value: Any): Boolean = {
      val inner = expr.trim.stripPrefix("{{").stripSuffix("}}").trim
      evalOr(inner, value)
    }

    private def evalOr(e: String, v: Any): Boolean =
      splitTop(e, " or ").exists(part => evalAnd(part, v))

    private def evalAnd(e: String, v: Any): Boolean =
      splitTop(e, " and ").forall(part => evalCmp(part.trim, v))

    /** split outside quotes only (the selectors never nest parens) */
    private def splitTop(e: String, sep: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var depth = 0; var inQ = false; var last = 0; var i = 0
      while (i <= e.length - sep.length) {
        val c = e.charAt(i)
        if (c == '\'') inQ = !inQ
        if (!inQ && depth == 0 && e.regionMatches(i, sep, 0, sep.length)) {
          out += e.substring(last, i); last = i + sep.length; i += sep.length
        } else i += 1
      }
      out += e.substring(last)
      out.toList
    }

    private def evalCmp(e: String, v: Any): Boolean = {
      val (neg, body) =
        if (e.contains("!=")) (true, e.split("!=", 2))
        else (false, e.split("==", 2))
      if (body.length != 2) return operand(e.trim, v) match {
        case null => false
        case b: java.lang.Boolean => b
        case s: String => s.nonEmpty
        case n => asNumber(n).forall(_ != 0)
      }
      val l = operand(body(0).trim, v)
      val r = operand(body(1).trim, v)
      val eq = eqNorm(l, r)
      if (neg) !eq else eq
    }

    private def operand(tok: String, v: Any): Any = tok match {
      case t if t.startsWith("'") && t.endsWith("'") =>
        t.substring(1, t.length - 1)
      case "None" | "none" | "null" => null
      case t if t.startsWith("value") =>
        val (pathPart, pipe) = t.indexOf('|') match {
          case -1 => (t, "")
          case i => (t.substring(0, i), t.substring(i + 1).trim)
        }
        val path = pathPart.stripPrefix("value").stripPrefix(".")
        val base = if (path.isEmpty) unwrap(v) else nested(v, path)
        pipe match {
          case "length" => base match {
            case null => null
            case s: Seq[_] => s.length.toLong
            case s: String => s.length.toLong
            case _ => null
          }
          case _ => base
        }
      case t if t.startsWith("0x") || t.startsWith("0X") =>
        BigInt(t.drop(2), 16)
      case t => scala.util.Try(BigDecimal(t)).toOption.orNull
    }
  }

  /** Action-level comparison normalization: opcode paths compare on the
    * unsigned 32-bit value. */
  def normalizeOpcode(v: Any): Any = unwrap(v) match {
    case l: Long => l & 0xffffffffL
    case l: java.lang.Long => l.longValue & 0xffffffffL
    case b: BigInt => b & BigInt("ffffffff", 16)
    case other => other
  }
}
