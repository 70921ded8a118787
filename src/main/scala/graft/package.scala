package object graft {
  /** Version of the graft engine library. */
  val Version = "0.1.0"
}
