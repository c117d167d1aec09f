// Offline-container resilience: if zinc's compiled-bridge cache is
// lost (e.g. a crashed concurrent sbt run), recompiling the bridge
// needs a -sources jar the offline resolver can't fetch. The
// precompiled binary bridge IS in the local artifact cache — point
// zinc straight at it.
ThisBuild / scalaCompilerBridgeBinaryJar := {
  val base = file(sys.props("user.home")) / ".cache" / "coursier"
  (base ** "compiler-bridge_2.12-1.10.0.jar").get.headOption
}
