package graft.dev
object CountReg { def main(a: Array[String]): Unit = {
  val all = graft.Registry.all
  println("COUNT=" + all.size + " oracles=" + all.count(_.oracle.isDefined))
}}
