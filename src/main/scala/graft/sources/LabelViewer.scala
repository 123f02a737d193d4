package graft.sources

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.Base64

import javax.imageio.ImageIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Offline interactive label viewer — the Spark-native analog of the
  * reference's matplotlib UI (`Hidden_MarkovModels/view_labels.py`):
  * one SELF-CONTAINED HTML artifact with every slice pre-rendered as a
  * base64 PNG and vanilla-JS navigation reproducing the reference's
  * keyboard semantics (right/down +1, left/up −1, home/end, start at
  * the mid slice) plus a slider. A headless engine cannot pop a
  * window; it CAN emit an artifact any browser opens with zero
  * dependencies — same QA affordance, batch-friendly.
  *
  * Faithful display semantics (view_labels.py:20-37, 48-55):
  *  - labels are remapped to MEAN-SORTED display order (argsort of the
  *    class means, inverse permutation applied per voxel);
  *  - colormap WM=red (0.90,0.20,0.20), GM=green (0.20,0.70,0.25),
  *    CSF=blue (0.20,0.40,0.90); voxels outside the mask render
  *    background black;
  *  - the title carries "slice i+1/Z" and the sorted class means
  *    rounded to 4 decimals.
  *
  * Scale: the voxel relation streams through `toLocalIterator` in
  * (z, y, x) order — one partition in driver memory at a time, the
  * ArraySinks discipline — and each slice's PNG is encoded and
  * appended as soon as its rows complete, so peak memory is one slice
  * plus one partition regardless of volume size. Output is written
  * tmp+atomic-move like every other sink. */
object LabelViewer {

  // view_labels.py:28-33 RGBA floats, rounded to bytes
  private val palette: Array[Int] = Array(
    rgb(230, 51, 51), // WM
    rgb(51, 179, 64), // GM
    rgb(51, 102, 230), // CSF
    rgb(0, 0, 0)) // background
  private def rgb(r: Int, g: Int, b: Int): Int = (r << 16) | (g << 8) | b

  /** voxels: (z, y, x, label, in_mask) covering the full (Z, Y, X)
    * grid; means: per-class intensity means (display order = argsort).
    * Writes one self-contained HTML file at `path`. */
  def write(voxels: DataFrame, shape: (Int, Int, Int), means: Seq[Double],
            path: String): Unit = {
    val (nz, ny, nx) = shape
    val order = means.zipWithIndex.sortBy(_._1).map(_._2)
    val inv = Array.ofDim[Int](means.size)
    order.zipWithIndex.foreach { case (orig, disp) => inv(orig) = disp }
    val sortedMeans = means.sorted.map(m => math.round(m * 1e4) / 1e4)

    val it = voxels.select(
      col("z").cast("int"), col("y").cast("int"), col("x").cast("int"),
      col("label").cast("int"), col("in_mask").cast("boolean"))
      .orderBy("z", "y", "x")
      .toLocalIterator()

    val tmp = Paths.get(path + ".tmp")
    val out = Files.newBufferedWriter(tmp, UTF_8)
    out.write(
      s"""<!DOCTYPE html><html><head><meta charset="utf-8">
         |<title>Segmentation viewer</title>
         |<style>img{width:${nx * 8}px;image-rendering:pixelated}
         |body{font-family:monospace;text-align:center;background:#111;color:#eee}</style>
         |</head><body>
         |<h3 id="t"></h3><img id="im"><br>
         |<input id="s" type="range" min="0" max="${nz - 1}" style="width:${nx * 8}px">
         |<script>const slices=[
         |""".stripMargin)

    var count = 0L
    for (z <- 0 until nz) {
      val img = new BufferedImage(nx, ny, BufferedImage.TYPE_INT_RGB)
      var filled = 0
      while (filled < ny * nx) {
        require(it.hasNext, s"voxel relation ended early at slice $z (${count + filled} rows)")
        val r = it.next()
        val (zz, y, x, lab, m) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4))
        require(zz == z && y == filled / nx && x == filled % nx,
          s"voxel relation is not a dense (z,y,x) grid: saw ($zz,$y,$x) at slice $z offset $filled")
        val disp = if (!m) 3 else inv(lab)
        img.setRGB(x, y, palette(disp))
        filled += 1
      }
      count += filled
      val buf = new ByteArrayOutputStream()
      ImageIO.write(img, "png", buf)
      out.write("\"data:image/png;base64," +
        Base64.getEncoder.encodeToString(buf.toByteArray) + "\",\n")
    }
    require(!it.hasNext, s"voxel relation has more than ${nz.toLong * ny * nx} rows")

    out.write(
      s"""];
         |const Z=${nz};let z=Z>>1;
         |const means=${sortedMeans.mkString("[", ", ", "]")};
         |function redraw(){
         |  document.getElementById('im').src=slices[z];
         |  document.getElementById('s').value=z;
         |  document.getElementById('t').textContent=
         |    'Segmentation (WM=red, GM=green, CSF=blue) — slice '+(z+1)+'/'+Z+
         |    '  class means (sorted): ['+means.join(', ')+']';
         |}
         |document.addEventListener('keydown',e=>{
         |  if(e.key==='ArrowRight'||e.key==='ArrowDown')z=Math.min(z+1,Z-1);
         |  else if(e.key==='ArrowLeft'||e.key==='ArrowUp')z=Math.max(z-1,0);
         |  else if(e.key==='Home')z=0;
         |  else if(e.key==='End')z=Z-1;
         |  else return;
         |  redraw();});
         |document.getElementById('s').addEventListener('input',e=>{z=+e.target.value;redraw();});
         |redraw();
         |</script></body></html>
         |""".stripMargin)
    out.close()
    Files.move(tmp, Paths.get(path), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
