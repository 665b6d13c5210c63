// mock_pjrt — a fake multi-device PJRT C-API plugin for TESTS ONLY.
//
// The environment has no CPU PJRT plugin .so, so the serving container's
// multi-device dispatch (round-robin + portable execute_device +
// reassembly) cannot be exercised against a real runtime with more than
// one device. This plugin implements exactly the API surface
// native/serve_pjrt.cpp uses, exposes MOCK_DEVICES fake devices
// (default 4), and "executes" a FIXED, documented function instead of
// compiling the module bytes:
//
//   input  [B, n, 3] float32
//   out 0  [B, 2]    col 0 = sum of the frame's 3n floats
//                    col 1 = the frame's first float
//   out 1  [B, n, 3] = -0.5 * input     (gradient-shaped)
//
// A second execute argument (the bundle's chunk matrix, bf16 —
// serve_pjrt feeds it when the artifact carries a MOLANNCM section)
// is accepted and folded into out 0 col 0 as "+ sum of all chunk
// matrix entries", so tests can assert the table actually reached the
// device function.
//
// Both are trivially recomputable in numpy, so a test can check that
// batches routed across N devices and reassembled by the container are
// EXACTLY the per-frame function of the input — order, tail padding,
// bucket selection and all. Per-device execution counts are printed at
// client destroy so tests can assert all devices actually ran.
//
// MOCK_OUTPUTS=1 serves only out 0 (a no-gradient artifact).
//
// Build: make mock (same PJRT header as serve).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

// The C API forward-declares these as opaque structs; the plugin owns
// their definitions.
struct PJRT_Error {
  std::string message;
};

struct PJRT_Event {
  int dummy;
};

struct PJRT_Device {
  int id;
};

struct PJRT_Client {
  std::vector<PJRT_Device> devices;
  std::vector<PJRT_Device*> device_ptrs;
  std::vector<int64_t> exec_counts;
};

struct PJRT_Executable {
  size_t num_outputs;
};

struct PJRT_LoadedExecutable {
  PJRT_Client* client;
  PJRT_Executable exe;
};

struct PJRT_Buffer {
  std::vector<int64_t> dims;
  std::vector<float> data;
};

namespace {

PJRT_Error* err(const std::string& m) { return new PJRT_Error{m}; }

void E_Destroy(PJRT_Error_Destroy_Args* a) { delete a->error; }

void E_Message(PJRT_Error_Message_Args* a) {
  a->message = a->error->message.c_str();
  a->message_size = a->error->message.size();
}

PJRT_Error* Ev_Await(PJRT_Event_Await_Args*) { return nullptr; }

PJRT_Error* Ev_Destroy(PJRT_Event_Destroy_Args* a) {
  delete a->event;
  return nullptr;
}

PJRT_Error* Plugin_Init(PJRT_Plugin_Initialize_Args*) { return nullptr; }

PJRT_Error* Client_Create(PJRT_Client_Create_Args* a) {
  int n = 4;
  if (const char* envn = std::getenv("MOCK_DEVICES")) n = atoi(envn);
  if (n <= 0) n = 1;
  auto* c = new PJRT_Client;
  c->devices.resize(n);
  for (int i = 0; i < n; i++) c->devices[i].id = i;
  for (int i = 0; i < n; i++) c->device_ptrs.push_back(&c->devices[i]);
  c->exec_counts.assign(n, 0);
  a->client = c;
  return nullptr;
}

PJRT_Error* Client_Destroy(PJRT_Client_Destroy_Args* a) {
  std::fprintf(stderr, "mock_pjrt exec counts:");
  for (size_t i = 0; i < a->client->exec_counts.size(); i++) {
    std::fprintf(stderr, " dev%zu=%lld", i,
                 static_cast<long long>(a->client->exec_counts[i]));
  }
  std::fprintf(stderr, "\n");
  delete a->client;
  return nullptr;
}

PJRT_Error* Client_AddressableDevices(
    PJRT_Client_AddressableDevices_Args* a) {
  a->addressable_devices = a->client->device_ptrs.data();
  a->num_addressable_devices = a->client->device_ptrs.size();
  return nullptr;
}

PJRT_Error* Client_Compile(PJRT_Client_Compile_Args* a) {
  size_t nout = 2;
  if (const char* envn = std::getenv("MOCK_OUTPUTS")) nout = atoi(envn);
  auto* le = new PJRT_LoadedExecutable;
  le->client = a->client;
  le->exe.num_outputs = nout;
  a->executable = le;
  return nullptr;
}

PJRT_Error* LE_GetExecutable(PJRT_LoadedExecutable_GetExecutable_Args* a) {
  a->executable = &a->loaded_executable->exe;
  return nullptr;
}

PJRT_Error* LE_Destroy(PJRT_LoadedExecutable_Destroy_Args* a) {
  delete a->executable;
  return nullptr;
}

PJRT_Error* Exe_NumOutputs(PJRT_Executable_NumOutputs_Args* a) {
  a->num_outputs = a->executable->num_outputs;
  return nullptr;
}

PJRT_Error* Client_BufferFromHostBuffer(
    PJRT_Client_BufferFromHostBuffer_Args* a) {
  auto* b = new PJRT_Buffer;
  b->dims.assign(a->dims, a->dims + a->num_dims);
  int64_t count = 1;
  for (int64_t d : b->dims) count *= d;
  if (a->type == PJRT_Buffer_Type_F32) {
    b->data.assign(static_cast<const float*>(a->data),
                   static_cast<const float*>(a->data) + count);
  } else if (a->type == PJRT_Buffer_Type_BF16) {
    // widen bf16 -> f32 on upload (bf16 is the f32 high half)
    b->data.resize(count);
    const uint16_t* src = static_cast<const uint16_t*>(a->data);
    for (int64_t k = 0; k < count; k++) {
      uint32_t bits = static_cast<uint32_t>(src[k]) << 16;
      std::memcpy(&b->data[k], &bits, 4);
    }
  } else {
    delete b;
    return err("mock plugin only supports F32/BF16 buffers");
  }
  a->buffer = b;
  a->done_with_host_buffer = new PJRT_Event;
  return nullptr;
}

PJRT_Error* LE_Execute(PJRT_LoadedExecutable_Execute_Args* a) {
  if (a->num_devices != 1 || (a->num_args != 1 && a->num_args != 2)) {
    return err("mock plugin expects num_devices == 1, num_args in {1,2}");
  }
  PJRT_Client* c = a->executable->client;
  int dev_id = 0;
  if (c->device_ptrs.size() > 1) {
    if (a->execute_device == nullptr) {
      return err("multi-device mock requires execute_device (portable)");
    }
    dev_id = a->execute_device->id;
  }
  c->exec_counts[dev_id]++;

  const PJRT_Buffer* in = a->argument_lists[0][0];
  if (in->dims.size() != 3) return err("mock expects [B, n, 3] input");
  const int64_t B = in->dims[0];
  const int64_t fpf = in->dims[1] * in->dims[2];

  double cmat_sum = 0;
  if (a->num_args == 2) {
    const PJRT_Buffer* cm = a->argument_lists[0][1];
    if (cm == nullptr) return err("mock: null chunk-matrix argument");
    for (float v : cm->data) cmat_sum += v;
  }

  auto* cv = new PJRT_Buffer;
  cv->dims = {B, 2};
  cv->data.resize(B * 2);
  for (int64_t f = 0; f < B; f++) {
    const float* row = in->data.data() + f * fpf;
    double s = 0;
    for (int64_t k = 0; k < fpf; k++) s += row[k];
    cv->data[f * 2 + 0] = static_cast<float>(s + cmat_sum);
    cv->data[f * 2 + 1] = row[0];
  }
  a->output_lists[0][0] = cv;

  if (a->executable->exe.num_outputs >= 2) {
    auto* g = new PJRT_Buffer;
    g->dims = in->dims;
    g->data.resize(in->data.size());
    for (size_t k = 0; k < in->data.size(); k++) {
      g->data[k] = -0.5f * in->data[k];
    }
    a->output_lists[0][1] = g;
  }
  if (a->device_complete_events) {
    a->device_complete_events[0] = new PJRT_Event;
  }
  return nullptr;
}

PJRT_Error* Buffer_ToHostBuffer(PJRT_Buffer_ToHostBuffer_Args* a) {
  const size_t bytes = a->src->data.size() * sizeof(float);
  if (a->dst == nullptr) {
    a->dst_size = bytes;
    return nullptr;
  }
  if (a->dst_size < bytes) return err("dst too small");
  // mock buffers are already dense row-major; the requested
  // minor_to_major [.., 1, 0] host layout is exactly that
  std::memcpy(a->dst, a->src->data.data(), bytes);
  a->event = new PJRT_Event;
  return nullptr;
}

PJRT_Error* Buffer_Destroy(PJRT_Buffer_Destroy_Args* a) {
  delete a->buffer;
  return nullptr;
}

PJRT_Api g_mock_api;

}  // namespace

extern "C" const PJRT_Api* GetPjrtApi() {
  std::memset(&g_mock_api, 0, sizeof(g_mock_api));
  g_mock_api.struct_size = PJRT_Api_STRUCT_SIZE;
  g_mock_api.pjrt_api_version.major_version = PJRT_API_MAJOR;
  g_mock_api.pjrt_api_version.minor_version = PJRT_API_MINOR;
  g_mock_api.PJRT_Error_Destroy = E_Destroy;
  g_mock_api.PJRT_Error_Message = E_Message;
  g_mock_api.PJRT_Event_Await = Ev_Await;
  g_mock_api.PJRT_Event_Destroy = Ev_Destroy;
  g_mock_api.PJRT_Plugin_Initialize = Plugin_Init;
  g_mock_api.PJRT_Client_Create = Client_Create;
  g_mock_api.PJRT_Client_Destroy = Client_Destroy;
  g_mock_api.PJRT_Client_AddressableDevices = Client_AddressableDevices;
  g_mock_api.PJRT_Client_Compile = Client_Compile;
  g_mock_api.PJRT_LoadedExecutable_GetExecutable = LE_GetExecutable;
  g_mock_api.PJRT_LoadedExecutable_Destroy = LE_Destroy;
  g_mock_api.PJRT_Executable_NumOutputs = Exe_NumOutputs;
  g_mock_api.PJRT_Client_BufferFromHostBuffer = Client_BufferFromHostBuffer;
  g_mock_api.PJRT_LoadedExecutable_Execute = LE_Execute;
  g_mock_api.PJRT_Buffer_ToHostBuffer = Buffer_ToHostBuffer;
  g_mock_api.PJRT_Buffer_Destroy = Buffer_Destroy;
  return &g_mock_api;
}
