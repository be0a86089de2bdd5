package graft.ingest

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Post-load file archival: copy input to the destination directory
  * (mkdir -p), delete the original — fileloader/fileloader.go:263-328.
  * Driver-side (file lifecycle is a control-plane action); the streaming
  * analog is `cleanSource=archive` on a file source. */
object Archive {
  def moveInputFile(inputFile: String, destinationFolder: String): java.nio.file.Path = {
    val src = Paths.get(inputFile)
    val destDir = Paths.get(destinationFolder)
    Files.createDirectories(destDir)
    val dest = destDir.resolve(src.getFileName)
    Files.move(src, dest, StandardCopyOption.REPLACE_EXISTING)
    dest
  }
}
