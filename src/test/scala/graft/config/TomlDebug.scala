package graft.config

object TomlDebug {
  def main(args: Array[String]): Unit = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args.headOption.getOrElse(
        "/root/reference/src/config.example.toml"))), "UTF-8")
    val root = Toml.parse(text)
    def show(v: Any): String = v match {
      case m: Map[_, _] => s"table(${m.size})"
      case s: Seq[_] => s"seq(${s.size})"
      case other => String.valueOf(other).take(40)
    }
    root.foreach { case (k, v) => println(s"$k -> ${show(v)}") }
  }
}
