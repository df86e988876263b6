// Execute the ACTUAL reference engine (/root/reference/geowarp.js) on a
// synthetic fixture, with its npm dependencies replaced by the small
// shims in ./node_modules (run with NODE_PATH=tools/refshim/node_modules).
//
// What this proves / doesn't prove (the honest framing COVERAGE.md
// carries): geowarp.js's own CONTROL FLOW — kernel loops, rounding,
// window clamping, no-data handling, band selection, insertion — runs
// for real; the leaf math (affine, bbox reprojection, scanline
// rasterization, median/min/max) comes from shims that mirror the same
// formulas the Python engine uses, so any output difference isolates a
// kernel-semantics divergence rather than a libm one.  Same-SRS configs
// avoid transcendental libm differences entirely; reprojected configs
// additionally exercise V8-vs-numpy sin/atan agreement and are reported
// separately.
//
// stdin: JSON spec {in_data: [[band ints...]], in_bbox, in_srs,
//   in_width, in_height, in_no_data?, dtype: "Uint8Array",
//   jobs: [{z, x, y, out_bbox, out_srs, out_width, out_height, method,
//           opts?: {...extra geowarp options...}}]}
// stdout: JSON {results: [{z, x, y, method, bands, data: [[ints]]}]}

const geowarp = require("/root/reference/geowarp.js");

const R = 6378137.0;
const DEG2RAD = Math.PI / 180;
const RAD2DEG = 180 / Math.PI;

// EPSG:4326 <-> 3857, same formulas/operation order as
// geowarp_spark/kernels/proj.py WebMercator (per-point form)
const webmercForward = ([lon, lat]) => {
  const x = R * (lon * DEG2RAD);
  const y = Math.abs(lat) >= 90 ? NaN : R * Math.atanh(Math.sin(lat * DEG2RAD));
  return [x, y];
};
const webmercInverse = ([x, y]) => {
  const lon = (x / R) * RAD2DEG;
  const lat = (2 * Math.atan(Math.exp(y / R)) - Math.PI / 2) * RAD2DEG;
  return [lon, lat];
};

const TYPED = {
  Uint8Array, Int8Array, Uint16Array, Int16Array,
  Uint32Array, Int32Array, Float32Array, Float64Array
};

const xdim = require("xdim");

// canonical per-band flat arrays ("[band][row,column]") -> any layout
const fromCanonical = (bands, layout, sizes, typeName) => {
  if (layout === "[band][row,column]") return bands;
  const { data } = xdim.prepareData({
    layout, sizes, arrayTypes: new Array(sizes.band).fill(typeName)
  });
  const update = xdim.prepareUpdate({ data, layout, sizes });
  const W = sizes.column;
  for (let band = 0; band < sizes.band; band++) {
    const src = bands[band];
    for (let row = 0; row < sizes.row; row++) {
      const base = row * W;
      for (let column = 0; column < W; column++) {
        update({ point: { band, row, column }, value: src[base + column] });
      }
    }
  }
  return data;
};

// any layout -> canonical per-band flat plain arrays
const toCanonical = (data, layout, sizes) => {
  const select = xdim.prepareSelect({ data, layout, sizes });
  const out = [];
  const W = sizes.column;
  for (let band = 0; band < sizes.band; band++) {
    const buf = new Array(sizes.row * W);
    for (let row = 0; row < sizes.row; row++) {
      for (let column = 0; column < W; column++) {
        buf[row * W + column] = select({ point: { band, row, column } }).value;
      }
    }
    out.push(buf);
  }
  return out;
};

const main = () => {
  const chunks = [];
  process.stdin.on("data", d => chunks.push(d));
  process.stdin.on("end", () => {
    const spec = JSON.parse(Buffer.concat(chunks).toString());
    const Ctor = TYPED[spec.dtype];
    if (!Ctor) throw new Error("unsupported dtype " + spec.dtype);
    const in_data = spec.in_data.map(band => Ctor.from(band));
    const bands = in_data.length;
    const results = [];
    for (const job of spec.jobs) {
      const same = spec.in_srs === job.out_srs;
      const opts = { ...(job.opts || {}) };
      // expr is a function-valued option — JSON can't carry it, so the
      // runner exposes named exprs mirrored on the Python side
      if (opts.expr_name) {
        const EXPRS = {
          swap: ({ pixel }) => [pixel[2], pixel[1], pixel[0]],
          half: ({ pixel }) => pixel.map(v => v / 2)
        };
        opts.expr = EXPRS[opts.expr_name];
        if (!opts.expr) throw new Error("unknown expr_name " + opts.expr_name);
        delete opts.expr_name;
      }
      // custom-reducer methods are function-valued (geowarp.js:849-850);
      // named reducers mirror the Python side (pin_reference.py)
      let method = job.method;
      if (method === "__custom_first__") method = ({ values }) => values[0];
      const inLayout = opts.in_layout || "[band][row,column]";
      const outLayout = opts.out_layout || "[band][row,column]";
      delete opts.in_layout;
      delete opts.out_layout;
      const inSizes = { band: bands, row: spec.in_height, column: spec.in_width };
      const options = {
        in_data: fromCanonical(in_data, inLayout, inSizes, spec.dtype),
        in_bbox: spec.in_bbox,
        in_srs: spec.in_srs,
        in_width: spec.in_width,
        in_height: spec.in_height,
        // skewed rasters need the full 6-param transform (geowarp.js:304
        // only synthesizes an unskewed one from the bbox)
        ...(spec.in_geotransform ? { in_geotransform: spec.in_geotransform } : {}),
        in_layout: inLayout,
        out_layout: outLayout,
        out_bbox: job.out_bbox,
        out_srs: job.out_srs,
        out_width: job.out_width,
        out_height: job.out_height,
        method,
        out_array_types: new Array(bands).fill(spec.dtype),
        ...opts
      };
      if (!("in_no_data" in opts) && spec.in_no_data !== undefined && spec.in_no_data !== null) {
        options.in_no_data = spec.in_no_data;
      }
      if (!same) {
        if (!(spec.in_srs === 4326 && job.out_srs === 3857)) {
          throw new Error("only 4326<->3857 reprojection wired in the runner");
        }
        options.forward = webmercForward;   // in_srs -> out_srs
        options.inverse = webmercInverse;   // out_srs -> in_srs
      }
      const res = geowarp(options);
      if (res && typeof res.then === "function") {
        throw new Error("async result unexpected (quick-resolve shim is sync)");
      }
      if (!res || !res.data) {
        throw new Error(
          "reference returned no data (zero inserted pixels) for job " +
          JSON.stringify({ z: job.z, x: job.x, y: job.y, method: job.method,
                           config: job.config }));
      }
      const outBands = res.out_pixel_depth || res.out_bands.length;
      const outSizes = { band: outBands, row: job.out_height, column: job.out_width };
      const canon = toCanonical(res.data, outLayout, outSizes);
      results.push({
        z: job.z, x: job.x, y: job.y, method: job.method,
        bands: outBands,
        data: canon.map(band => Array.from(band))
      });
    }
    process.stdout.write(JSON.stringify({ results }));
  });
};

main();
