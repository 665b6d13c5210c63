// serve_pjrt — a no-Python serving container for molann_tpu models.
//
// Loads a raw StableHLO artifact (export_stablehlo(..., raw_mlir=True,
// batch_size=B)) and runs it on any PJRT C-API plugin: libtpu.so on a TPU
// host, a CPU plugin, or this environment's tunnel plugin. This is the
// TPU-native analogue of the reference's TorchScript serving contract
// (reference README.rst:51: downstream engines load the .pt from C++ with
// LibTorch, no Python needed) — here the engine side needs only the
// PJRT C header and dlopen.
//
//   serve_pjrt <plugin.so> <model.mlir.bc> <traj> <out.npy> [batch]
//              [-o key=value ...]
//
// -o passes plugin-specific client-create options as PJRT_NamedValues
// (int64 when the value parses as an integer, string otherwise) — e.g.
// libtpu's ml_framework_name, or a tunnel plugin's session handshake.
//
// <traj>: any format the native loader reads — .npy ([n_frames,
// n_atoms, 3] or packed), CHARMM/NAMD .dcd, GROMACS .trr / compressed
// .xtc — i.e. the container serves straight from an MD engine's output.
// out.npy: float32 [n_frames, d] CV values (output 0 of the artifact).
// For with_gradient artifacts (two outputs) the coordinate gradients —
// output 1, [n_frames, n_atoms, 3] — are additionally written next to
// out.npy with a .grad.npy suffix (forces = -gradients); a biased-MD
// engine would consume them in-process instead.
// The final partial batch is padded to B and trimmed after execution.
//
// Build: make serve (needs the PJRT C header; see TF_INC in Makefile).

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <dlfcn.h>

#include "traj_loader.h"
#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

const PJRT_Api* g_api = nullptr;

[[noreturn]] void die(const std::string& msg) {
  std::fprintf(stderr, "serve_pjrt: %s\n", msg.c_str());
  std::exit(1);
}

void check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args m{};
  m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  m.error = err;
  g_api->PJRT_Error_Message(&m);
  std::string text(m.message, m.message_size);
  PJRT_Error_Destroy_Args d{};
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = err;
  g_api->PJRT_Error_Destroy(&d);
  die(std::string(what) + ": " + text);
}

void await(PJRT_Event* event, const char* what) {
  PJRT_Event_Await_Args a{};
  a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  a.event = event;
  check(g_api->PJRT_Event_Await(&a), what);
  PJRT_Event_Destroy_Args d{};
  d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  d.event = event;
  g_api->PJRT_Event_Destroy(&d);
}

std::vector<uint8_t> read_file(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) die(std::string("cannot open ") + path);
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(n));
  if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    die(std::string("short read on ") + path);
  }
  std::fclose(f);
  return buf;
}

void write_npy(const char* path, const float* data, int64_t rows,
               int64_t cols) {
  char dict[128];
  int n = std::snprintf(dict, sizeof(dict),
                        "{'descr': '<f4', 'fortran_order': False, "
                        "'shape': (%lld, %lld), }",
                        static_cast<long long>(rows),
                        static_cast<long long>(cols));
  int total = ((10 + n + 1 + 63) / 64) * 64;  // newline-terminated, 64-pad
  std::string header(dict, n);
  header.append(total - 10 - n - 1, ' ');
  header.push_back('\n');
  FILE* f = std::fopen(path, "wb");
  if (!f) die(std::string("cannot write ") + path);
  uint16_t hlen = static_cast<uint16_t>(header.size());
  std::fwrite("\x93NUMPY\x01\x00", 1, 8, f);
  std::fwrite(&hlen, 2, 1, f);
  std::fwrite(header.data(), 1, header.size(), f);
  std::fwrite(data, sizeof(float), static_cast<size_t>(rows * cols), f);
  std::fclose(f);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(
        stderr,
        "usage: %s <pjrt_plugin.so> <model.mlir.bc> <traj.npy> <out.npy> "
        "[batch=1024] [-o key=value ...]\n",
        argv[0]);
    return 2;
  }
  int64_t B = 1024;
  std::vector<std::pair<std::string, std::string>> raw_opts;
  for (int i = 5; i < argc; i++) {
    if (std::strcmp(argv[i], "-o") == 0 && i + 1 < argc) {
      std::string kv = argv[++i];
      size_t eq = kv.find('=');
      if (eq == std::string::npos) die("-o expects key=value");
      raw_opts.emplace_back(kv.substr(0, eq), kv.substr(eq + 1));
    } else {
      B = atoll(argv[i]);
      if (B <= 0) die("batch must be positive");
    }
  }
  std::vector<PJRT_NamedValue> opts(raw_opts.size());
  for (size_t i = 0; i < raw_opts.size(); i++) {
    PJRT_NamedValue& v = opts[i];
    v = PJRT_NamedValue{};
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.name = raw_opts[i].first.c_str();
    v.name_size = raw_opts[i].first.size();
    const std::string& val = raw_opts[i].second;
    char* endp = nullptr;
    long long iv = strtoll(val.c_str(), &endp, 10);
    if (!val.empty() && endp && *endp == '\0') {
      v.type = PJRT_NamedValue_kInt64;
      v.int64_value = iv;
      v.value_size = 1;
    } else {
      v.type = PJRT_NamedValue_kString;
      v.string_value = val.c_str();
      v.value_size = val.size();
    }
  }

  // --- plugin ---
  void* lib = dlopen(argv[1], RTLD_NOW | RTLD_LOCAL);
  if (!lib) die(std::string("dlopen: ") + dlerror());
  auto get_api = reinterpret_cast<const PJRT_Api* (*)()>(
      dlsym(lib, "GetPjrtApi"));
  if (!get_api) die("plugin does not export GetPjrtApi");
  g_api = get_api();
  std::fprintf(stderr, "PJRT API %d.%d\n",
               g_api->pjrt_api_version.major_version,
               g_api->pjrt_api_version.minor_version);

  PJRT_Plugin_Initialize_Args init{};
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  check(g_api->PJRT_Plugin_Initialize(&init), "Plugin_Initialize");

  PJRT_Client_Create_Args cc{};
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = opts.empty() ? nullptr : opts.data();
  cc.num_options = opts.size();
  check(g_api->PJRT_Client_Create(&cc), "Client_Create");
  PJRT_Client* client = cc.client;

  PJRT_Client_AddressableDevices_Args ad{};
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = client;
  check(g_api->PJRT_Client_AddressableDevices(&ad), "AddressableDevices");
  if (ad.num_addressable_devices == 0) die("no addressable devices");
  PJRT_Device* device = ad.addressable_devices[0];
  std::fprintf(stderr, "devices: %zu\n", ad.num_addressable_devices);

  // --- compile ---
  std::vector<uint8_t> module = read_file(argv[2]);
  PJRT_Program program{};
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = reinterpret_cast<char*>(module.data());
  program.code_size = module.size();
  program.format = "mlir";
  program.format_size = 4;
  // serialized xla.CompileOptionsProto:
  //   executable_build_options { num_replicas: 1  num_partitions: 1 }
  // (field numbers 3 / 4 / 5 per xla/pjrt/proto/compile_options.proto)
  static const char kOptions[] = {0x1a, 0x04, 0x20, 0x01, 0x28, 0x01};
  PJRT_Client_Compile_Args comp{};
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  comp.compile_options = kOptions;
  comp.compile_options_size = sizeof(kOptions);
  check(g_api->PJRT_Client_Compile(&comp), "Compile");
  PJRT_LoadedExecutable* exec = comp.executable;

  PJRT_LoadedExecutable_GetExecutable_Args ge{};
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = exec;
  check(g_api->PJRT_LoadedExecutable_GetExecutable(&ge), "GetExecutable");
  PJRT_Executable_NumOutputs_Args no{};
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no.executable = ge.executable;
  check(g_api->PJRT_Executable_NumOutputs(&no), "NumOutputs");
  std::fprintf(stderr, "compiled: %zu output(s)\n", no.num_outputs);

  // --- trajectory (any native-loader format: npy/dcd/trr/xtc) ---
  int64_t n_frames = 0, fpf = 0;
  void* ldr = tl_open(argv[3], &n_frames, &fpf);
  if (!ldr) die(std::string("open trajectory: ") + tl_last_error());
  const int64_t n_atoms = fpf / 3;
  std::fprintf(stderr, "trajectory: %lld frames x %lld atoms\n",
               static_cast<long long>(n_frames),
               static_cast<long long>(n_atoms));

  std::vector<float> host_in(static_cast<size_t>(B) * fpf);
  std::vector<float> out_all;   // [n_frames, d], d discovered on batch 0
  std::vector<float> grad_all;  // [n_frames, 3n] when the artifact has 2 outputs
  const bool want_grad = no.num_outputs >= 2;
  if (want_grad) grad_all.resize(static_cast<size_t>(n_frames) * fpf);
  int64_t d_out = -1;

  const auto t_serve0 = std::chrono::steady_clock::now();
  for (int64_t start = 0; start < n_frames; start += B) {
    const int64_t take = std::min(B, n_frames - start);
    if (tl_read_range(ldr, start, take, host_in.data()) != 0) {
      die(std::string("read trajectory: ") + tl_last_error());
    }
    if (take < B) {  // pad the tail batch with the last frame
      const float* last = host_in.data() + (take - 1) * fpf;
      for (int64_t r = take; r < B; r++) {
        std::memcpy(host_in.data() + r * fpf, last, fpf * sizeof(float));
      }
    }
    // overlap page-in of the next batch with this batch's execution
    if (start + B < n_frames) {
      std::vector<int64_t> nxt;
      for (int64_t f = start + B;
           f < std::min(start + 2 * B, n_frames); f++) {
        nxt.push_back(f);
      }
      tl_prefetch(ldr, nxt.data(), static_cast<int64_t>(nxt.size()));
    }

    const int64_t dims[3] = {B, n_atoms, 3};
    PJRT_Client_BufferFromHostBuffer_Args hb{};
    hb.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    hb.client = client;
    hb.data = host_in.data();
    hb.type = PJRT_Buffer_Type_F32;
    hb.dims = dims;
    hb.num_dims = 3;
    hb.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    hb.device = device;
    check(g_api->PJRT_Client_BufferFromHostBuffer(&hb), "BufferFromHost");
    await(hb.done_with_host_buffer, "host buffer transfer");
    PJRT_Buffer* in_buf = hb.buffer;

    PJRT_ExecuteOptions opts{};
    opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    PJRT_Buffer* const arg_list[1] = {in_buf};
    PJRT_Buffer* const* const arg_lists[1] = {arg_list};
    std::vector<PJRT_Buffer*> outs(no.num_outputs, nullptr);
    PJRT_Buffer** const out_lists[1] = {outs.data()};
    PJRT_Event* done[1] = {nullptr};
    PJRT_LoadedExecutable_Execute_Args ex{};
    ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ex.executable = exec;
    ex.options = &opts;
    ex.argument_lists = arg_lists;
    ex.num_devices = 1;
    ex.num_args = 1;
    ex.output_lists = out_lists;
    ex.device_complete_events = done;
    check(g_api->PJRT_LoadedExecutable_Execute(&ex), "Execute");
    await(done[0], "execution");

    // output 0 = CV values [B, d]
    PJRT_Buffer_ToHostBuffer_Args th{};
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = outs[0];
    th.dst = nullptr;
    check(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHost(size)");
    if (d_out < 0) {
      d_out = static_cast<int64_t>(th.dst_size) / (B * sizeof(float));
      out_all.resize(static_cast<size_t>(n_frames) * d_out);
    }
    // host_layout = nullptr copies in the DEVICE layout — on TPU that is
    // column-major/tiled; request dense row-major [B, d] explicitly.
    // Tiled form (not Strides): that is what jaxlib always passes, so
    // it's the layout form every plugin handles.
    const int64_t minor_to_major[2] = {1, 0};
    PJRT_Buffer_MemoryLayout lay{};
    lay.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
    lay.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
    lay.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
    lay.tiled.minor_to_major = minor_to_major;
    lay.tiled.minor_to_major_size = 2;
    th.host_layout = &lay;
    std::vector<float> host_out(th.dst_size / sizeof(float));
    th.dst = host_out.data();
    check(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHost");
    await(th.event, "device-to-host copy");
    std::memcpy(out_all.data() + start * d_out, host_out.data(),
                static_cast<size_t>(take) * d_out * sizeof(float));

    if (want_grad) {
      // output 1 = coordinate gradients [B, n_atoms, 3]
      const int64_t m2m3[3] = {2, 1, 0};
      PJRT_Buffer_MemoryLayout glay{};
      glay.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
      glay.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
      glay.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
      glay.tiled.minor_to_major = m2m3;
      glay.tiled.minor_to_major_size = 3;
      std::vector<float> host_g(static_cast<size_t>(B) * fpf);
      PJRT_Buffer_ToHostBuffer_Args tg{};
      tg.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      tg.src = outs[1];
      tg.host_layout = &glay;
      tg.dst = host_g.data();
      tg.dst_size = host_g.size() * sizeof(float);
      check(g_api->PJRT_Buffer_ToHostBuffer(&tg), "ToHost(grad)");
      await(tg.event, "gradient device-to-host copy");
      std::memcpy(grad_all.data() + start * fpf, host_g.data(),
                  static_cast<size_t>(take) * fpf * sizeof(float));
    }

    PJRT_Buffer_Destroy_Args bd{};
    bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    bd.buffer = in_buf;
    check(g_api->PJRT_Buffer_Destroy(&bd), "Buffer_Destroy");
    for (PJRT_Buffer* b : outs) {
      bd.buffer = b;
      check(g_api->PJRT_Buffer_Destroy(&bd), "Buffer_Destroy");
    }
  }

  const double serve_s =
      std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                    t_serve0)
          .count();
  std::fprintf(stderr,
               "served %lld frames in %.3f s (%.2fM frames/s incl. host "
               "round-trips)\n",
               static_cast<long long>(n_frames), serve_s,
               n_frames / serve_s / 1e6);
  write_npy(argv[4], out_all.data(), n_frames, d_out);
  std::fprintf(stderr, "wrote %s: [%lld, %lld]\n", argv[4],
               static_cast<long long>(n_frames),
               static_cast<long long>(d_out));
  if (want_grad) {
    std::string gpath = argv[4];
    size_t dot = gpath.rfind(".npy");
    gpath = (dot == std::string::npos ? gpath : gpath.substr(0, dot))
          + ".grad.npy";
    write_npy(gpath.c_str(), grad_all.data(), n_frames, fpf);
    std::fprintf(stderr, "wrote %s: [%lld, %lld]\n", gpath.c_str(),
                 static_cast<long long>(n_frames),
                 static_cast<long long>(fpf));
  }

  tl_close(ldr);
  PJRT_Client_Destroy_Args cd{};
  cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  cd.client = client;
  check(g_api->PJRT_Client_Destroy(&cd), "Client_Destroy");
  return 0;
}
