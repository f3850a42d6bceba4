package graft.graphql

/** GraphQL executable-document AST — the subset the engine serves: fields
  * with aliases, arguments of scalar/list/object values, nested selection
  * sets. (No fragment/variable support in round 1; the reference's derived
  * schema only needs plain selections.)
  */
sealed trait GVal
object GVal {
  final case class GInt(v: Long) extends GVal
  final case class GFloat(v: Double) extends GVal
  final case class GStr(v: String) extends GVal
  final case class GBool(v: Boolean) extends GVal
  case object GNull extends GVal
  final case class GEnum(v: String) extends GVal
  final case class GList(v: Seq[GVal]) extends GVal
  final case class GObj(v: Seq[(String, GVal)]) extends GVal {
    def get(name: String): Option[GVal] = v.collectFirst { case (`name`, x) => x }
  }
}

final case class GField(
    alias: Option[String],
    name: String,
    args: Seq[(String, GVal)],
    sels: Seq[GField],
    typeCond: Option[String] = None) {
  def outName: String = alias.getOrElse(name)
  def arg(name: String): Option[GVal] = args.collectFirst { case (`name`, v) => v }
  /** Does this field apply inside a parent of GraphQL type `t`? Fields
    * spliced from fragments carry the fragment's type condition; fields
    * written directly have none and always apply. */
  def appliesTo(t: String): Boolean = typeCond.forall(_ == t)
}

final case class GDocument(sels: Seq[GField])
