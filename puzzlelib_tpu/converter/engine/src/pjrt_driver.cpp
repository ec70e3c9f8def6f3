// Native serving host driver over the PJRT C API.
//
// TPU-native counterpart of the reference's TensorRT/OpenVINO C++ drivers
// (/root/reference/Converter/TensorRT/Source/Driver.cpp,
//  /root/reference/Converter/OpenVINO/Source/Driver.cpp): a standalone C++
// runtime that loads a serialized StableHLO engine produced by
// puzzlelib_tpu.converter.engine.buildEngine, compiles it through any PJRT
// plugin (e.g. the TPU plugin .so), and executes inference without a Python
// interpreter in the serving path.
//
// Usage:
//   pjrt_driver <plugin.so> <program.mlir> <output.npy> <input1.npy> [...]
//
// Only float32 dense tensors are handled (the engine builder pins the serving
// boundary to f32); .npy I/O is implemented inline (v1 format).

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include <dlfcn.h>
#include <unistd.h>

#include "third_party/pjrt_c_api.h"

namespace {

[[noreturn]] void fatal(const std::string &msg) {
    std::fprintf(stderr, "pjrt_driver: %s\n", msg.c_str());
    std::exit(1);
}

void check(const PJRT_Api *api, PJRT_Error *err, const char *what) {
    if (err == nullptr) {
        return;
    }

    PJRT_Error_Message_Args margs;
    std::memset(&margs, 0, sizeof(margs));
    margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
    margs.error = err;
    api->PJRT_Error_Message(&margs);

    std::string message(margs.message, margs.message_size);

    PJRT_Error_Destroy_Args dargs;
    std::memset(&dargs, 0, sizeof(dargs));
    dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
    dargs.error = err;
    api->PJRT_Error_Destroy(&dargs);

    fatal(std::string(what) + ": " + message);
}

void awaitEvent(const PJRT_Api *api, PJRT_Event *event, const char *what) {
    PJRT_Event_Await_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    args.event = event;
    check(api, api->PJRT_Event_Await(&args), what);

    PJRT_Event_Destroy_Args dargs;
    std::memset(&dargs, 0, sizeof(dargs));
    dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    dargs.event = event;
    check(api, api->PJRT_Event_Destroy(&dargs), "Event_Destroy");
}

// -- minimal .npy v1 I/O (float32, C order) ----------------------------------

struct NpyArray {
    std::vector<int64_t> dims;
    std::vector<float> data;
};

NpyArray loadNpy(const std::string &path) {
    std::ifstream file(path, std::ios::binary);
    if (!file) {
        fatal("cannot open " + path);
    }

    char magic[6];
    file.read(magic, 6);
    if (std::memcmp(magic, "\x93NUMPY", 6) != 0) {
        fatal(path + " is not a .npy file");
    }

    unsigned char version[2];
    file.read(reinterpret_cast<char *>(version), 2);

    uint32_t headerLen = 0;
    if (version[0] == 1) {
        uint16_t len16;
        file.read(reinterpret_cast<char *>(&len16), 2);
        headerLen = len16;
    } else {
        file.read(reinterpret_cast<char *>(&headerLen), 4);
    }

    std::string header(headerLen, '\0');
    file.read(header.data(), headerLen);

    if (header.find("'descr': '<f4'") == std::string::npos &&
        header.find("'descr':'<f4'") == std::string::npos) {
        fatal(path + ": only float32 ('<f4') arrays are supported");
    }
    if (header.find("'fortran_order': False") == std::string::npos) {
        fatal(path + ": fortran-order arrays are not supported");
    }

    NpyArray out;

    size_t shapePos = header.find("'shape': (");
    if (shapePos == std::string::npos) {
        fatal(path + ": cannot locate shape in npy header");
    }

    size_t pos = shapePos + 10;
    while (header[pos] != ')') {
        while (pos < header.size() && !isdigit(header[pos]) && header[pos] != ')') {
            ++pos;
        }
        if (header[pos] == ')') {
            break;
        }

        int64_t dim = 0;
        while (isdigit(header[pos])) {
            dim = dim * 10 + (header[pos] - '0');
            ++pos;
        }
        out.dims.push_back(dim);
    }

    int64_t count = 1;
    for (int64_t d : out.dims) {
        count *= d;
    }

    out.data.resize(count);
    file.read(reinterpret_cast<char *>(out.data.data()), count * sizeof(float));

    if (!file) {
        fatal(path + ": truncated data");
    }

    return out;
}

void saveNpy(const std::string &path, const std::vector<int64_t> &dims, const float *data) {
    std::ostringstream shape;
    shape << "(";
    for (size_t i = 0; i < dims.size(); ++i) {
        shape << dims[i] << (dims.size() == 1 ? "," : (i + 1 < dims.size() ? ", " : ""));
    }
    shape << ")";

    std::string header = "{'descr': '<f4', 'fortran_order': False, 'shape': " + shape.str() + ", }";
    size_t total = 10 + header.size() + 1;
    size_t padded = (total + 63) / 64 * 64;
    header += std::string(padded - total, ' ');
    header += '\n';

    std::ofstream file(path, std::ios::binary);
    file.write("\x93NUMPY\x01\x00", 8);

    uint16_t len = static_cast<uint16_t>(header.size());
    file.write(reinterpret_cast<char *>(&len), 2);
    file.write(header.data(), header.size());

    int64_t count = 1;
    for (int64_t d : dims) {
        count *= d;
    }
    file.write(reinterpret_cast<const char *>(data), count * sizeof(float));
}

// -- minimal protobuf varint encoding for CompileOptionsProto ----------------

void appendVarint(std::string &out, uint64_t value) {
    while (true) {
        uint8_t byte = value & 0x7F;
        value >>= 7;

        if (value) {
            out.push_back(static_cast<char>(byte | 0x80));
        } else {
            out.push_back(static_cast<char>(byte));
            return;
        }
    }
}

std::string compileOptionsProto() {
    // ExecutableBuildOptionsProto { num_replicas(4) = 1, num_partitions(5) = 1 }
    std::string build;
    appendVarint(build, (4 << 3) | 0);  // field 4, varint
    appendVarint(build, 1);
    appendVarint(build, (5 << 3) | 0);  // field 5, varint
    appendVarint(build, 1);

    // CompileOptionsProto { executable_build_options(3) = build }
    std::string options;
    appendVarint(options, (3 << 3) | 2);  // field 3, length-delimited
    appendVarint(options, build.size());
    options += build;

    return options;
}

std::string readFile(const std::string &path) {
    std::ifstream file(path, std::ios::binary);
    if (!file) {
        fatal("cannot open " + path);
    }

    std::ostringstream ss;
    ss << file.rdbuf();
    return ss.str();
}

}  // namespace

int main(int argc, char **argv) {
    if (argc < 5) {
        std::fprintf(stderr,
                     "usage: %s <plugin.so> <program.mlir> <output.npy> <input1.npy> [input2.npy ...]\n",
                     argv[0]);
        return 2;
    }

    const std::string pluginPath = argv[1];
    const std::string programPath = argv[2];
    const std::string outputPath = argv[3];

    std::vector<NpyArray> inputs;
    for (int i = 4; i < argc; ++i) {
        inputs.push_back(loadNpy(argv[i]));
    }

    // -- load plugin ---------------------------------------------------------

    void *handle = dlopen(pluginPath.c_str(), RTLD_NOW | RTLD_LOCAL);
    if (handle == nullptr) {
        fatal(std::string("dlopen failed: ") + dlerror());
    }

    using GetPjrtApiFn = const PJRT_Api *(*)();
    auto getApi = reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
    if (getApi == nullptr) {
        fatal("plugin does not export GetPjrtApi");
    }

    const PJRT_Api *api = getApi();
    std::fprintf(stderr, "pjrt_driver: PJRT API %d.%d\n",
                 api->pjrt_api_version.major_version, api->pjrt_api_version.minor_version);

    {
        PJRT_Plugin_Initialize_Args args;
        std::memset(&args, 0, sizeof(args));
        args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
        check(api, api->PJRT_Plugin_Initialize(&args), "Plugin_Initialize");
    }

    // -- client + device -----------------------------------------------------

    PJRT_Client *client = nullptr;
    {
        // Plugin-specific create options come from the environment so the same
        // binary drives any PJRT plugin.  PJRT_CLIENT_OPTIONS holds
        // ';'-separated entries "name=value" (value parsed as int64 when
        // possible, string otherwise); defaults target the axon TPU plugin.
        std::vector<std::pair<std::string, std::string>> rawOptions;

        const char *optionsEnv = std::getenv("PJRT_CLIENT_OPTIONS");
        std::string optionsStr = optionsEnv != nullptr ? optionsEnv : "";

        if (optionsStr.empty() && pluginPath.find("axon") != std::string::npos) {
            const char *gen = std::getenv("PALLAS_AXON_TPU_GEN");
            const char *rc = std::getenv("PALLAS_AXON_REMOTE_COMPILE");

            std::string topology = std::string(gen != nullptr ? gen : "v5e") + ":1x1x1";
            std::string sessionId = "pjrt-driver-" + std::to_string(::getpid());

            optionsStr = "remote_compile=" + std::string(rc != nullptr && rc[0] == '1' ? "1" : "0")
                + ";local_only=0;priority=0;n_slices=1;rank=4294967295"
                + ";topology=" + topology + ";session_id=" + sessionId;
        }

        size_t start = 0;
        while (start < optionsStr.size()) {
            size_t end = optionsStr.find(';', start);
            if (end == std::string::npos) {
                end = optionsStr.size();
            }

            std::string entry = optionsStr.substr(start, end - start);
            size_t eq = entry.find('=');
            if (eq != std::string::npos) {
                rawOptions.emplace_back(entry.substr(0, eq), entry.substr(eq + 1));
            }

            start = end + 1;
        }

        std::vector<PJRT_NamedValue> namedValues(rawOptions.size());
        std::vector<int64_t> intStorage(rawOptions.size());

        for (size_t i = 0; i < rawOptions.size(); ++i) {
            PJRT_NamedValue &nv = namedValues[i];
            std::memset(&nv, 0, sizeof(nv));

            nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
            nv.name = rawOptions[i].first.c_str();
            nv.name_size = rawOptions[i].first.size();

            const std::string &val = rawOptions[i].second;
            char *parseEnd = nullptr;
            long long asInt = std::strtoll(val.c_str(), &parseEnd, 10);

            if (!val.empty() && parseEnd != nullptr && *parseEnd == '\0') {
                intStorage[i] = asInt;
                nv.type = PJRT_NamedValue_kInt64;
                nv.int64_value = intStorage[i];
                nv.value_size = 1;
            } else {
                nv.type = PJRT_NamedValue_kString;
                nv.string_value = val.c_str();
                nv.value_size = val.size();
            }
        }

        PJRT_Client_Create_Args args;
        std::memset(&args, 0, sizeof(args));
        args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
        args.create_options = namedValues.data();
        args.num_options = namedValues.size();
        check(api, api->PJRT_Client_Create(&args), "Client_Create");
        client = args.client;
    }

    PJRT_Device *device = nullptr;
    {
        PJRT_Client_AddressableDevices_Args args;
        std::memset(&args, 0, sizeof(args));
        args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
        args.client = client;
        check(api, api->PJRT_Client_AddressableDevices(&args), "AddressableDevices");

        if (args.num_addressable_devices == 0) {
            fatal("no addressable devices");
        }
        device = args.addressable_devices[0];
    }

    // -- compile -------------------------------------------------------------

    std::string program = readFile(programPath);
    std::string options = compileOptionsProto();

    PJRT_LoadedExecutable *executable = nullptr;
    {
        PJRT_Program prog;
        std::memset(&prog, 0, sizeof(prog));
        prog.struct_size = PJRT_Program_STRUCT_SIZE;
        prog.code = program.data();
        prog.code_size = program.size();
        prog.format = "mlir";
        prog.format_size = 4;

        PJRT_Client_Compile_Args args;
        std::memset(&args, 0, sizeof(args));
        args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
        args.client = client;
        args.program = &prog;
        args.compile_options = options.data();
        args.compile_options_size = options.size();
        check(api, api->PJRT_Client_Compile(&args), "Compile");

        executable = args.executable;
    }

    // -- upload inputs -------------------------------------------------------

    std::vector<PJRT_Buffer *> argBuffers;

    for (const NpyArray &input : inputs) {
        PJRT_Client_BufferFromHostBuffer_Args args;
        std::memset(&args, 0, sizeof(args));
        args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
        args.client = client;
        args.data = input.data.data();
        args.type = PJRT_Buffer_Type_F32;
        args.dims = input.dims.data();
        args.num_dims = input.dims.size();
        args.host_buffer_semantics = PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
        args.device = device;
        check(api, api->PJRT_Client_BufferFromHostBuffer(&args), "BufferFromHostBuffer");

        awaitEvent(api, args.done_with_host_buffer, "host buffer transfer");
        argBuffers.push_back(args.buffer);
    }

    // -- execute -------------------------------------------------------------

    size_t numOutputs = 0;
    {
        PJRT_LoadedExecutable_GetExecutable_Args gargs;
        std::memset(&gargs, 0, sizeof(gargs));
        gargs.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
        gargs.loaded_executable = executable;
        check(api, api->PJRT_LoadedExecutable_GetExecutable(&gargs), "GetExecutable");

        PJRT_Executable_NumOutputs_Args nargs;
        std::memset(&nargs, 0, sizeof(nargs));
        nargs.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
        nargs.executable = gargs.executable;
        check(api, api->PJRT_Executable_NumOutputs(&nargs), "NumOutputs");

        numOutputs = nargs.num_outputs;
    }

    std::vector<PJRT_Buffer *> outputBuffers(numOutputs, nullptr);
    {
        PJRT_ExecuteOptions options2;
        std::memset(&options2, 0, sizeof(options2));
        options2.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

        PJRT_Buffer *const *argList = argBuffers.data();
        PJRT_Buffer **outputList = outputBuffers.data();
        PJRT_Event *completeEvent = nullptr;

        PJRT_LoadedExecutable_Execute_Args args;
        std::memset(&args, 0, sizeof(args));
        args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
        args.executable = executable;
        args.options = &options2;
        args.argument_lists = &argList;
        args.num_devices = 1;
        args.num_args = argBuffers.size();
        args.output_lists = &outputList;
        args.device_complete_events = &completeEvent;
        check(api, api->PJRT_LoadedExecutable_Execute(&args), "Execute");

        awaitEvent(api, completeEvent, "execution");
    }

    // -- download first output ----------------------------------------------

    {
        PJRT_Buffer *out = outputBuffers[0];

        PJRT_Buffer_Dimensions_Args dargs;
        std::memset(&dargs, 0, sizeof(dargs));
        dargs.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
        dargs.buffer = out;
        check(api, api->PJRT_Buffer_Dimensions(&dargs), "Buffer_Dimensions");

        std::vector<int64_t> dims(dargs.dims, dargs.dims + dargs.num_dims);

        PJRT_Buffer_ToHostBuffer_Args targs;
        std::memset(&targs, 0, sizeof(targs));
        targs.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
        targs.src = out;
        check(api, api->PJRT_Buffer_ToHostBuffer(&targs), "ToHostBuffer(size query)");

        std::vector<char> host(targs.dst_size);

        std::memset(&targs, 0, sizeof(targs));
        targs.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
        targs.src = out;
        targs.dst = host.data();
        targs.dst_size = host.size();
        check(api, api->PJRT_Buffer_ToHostBuffer(&targs), "ToHostBuffer");

        awaitEvent(api, targs.event, "device-to-host copy");

        saveNpy(outputPath, dims, reinterpret_cast<const float *>(host.data()));
    }

    std::fprintf(stderr, "pjrt_driver: wrote %s\n", outputPath.c_str());
    return 0;
}
