package graft.core

/** Small filesystem helpers shared by the store, server, and the
  * gate/bench harnesses (previously copy-pasted at each site).
  */
object Fs {
  /** Delete a file or directory tree. Does not follow directory
    * symlinks (listFiles on a symlink returns its target's children —
    * callers here only ever pass temp trees they created themselves).
    */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
