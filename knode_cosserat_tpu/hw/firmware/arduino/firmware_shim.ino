// Thin Arduino shim for the portable firmware core.
//
// All control logic (PID, anti-windup, e-stop, auto-tare, serial protocol,
// telemetry cadence) lives in ../tension_controller.{h,cpp} — this sketch
// only wires the hardware: analog load cells in, H-bridge PWM out, serial
// in/out. Pin map and calibration match the reference robot
// (reference firmware/firmware.ino:28-70: motors on (24,26,44), (4,5,6),
// (11,12,13), (7,8,9); load cells on A4..A7 at scale 2.56).
//
// Build: copy tension_controller.{h,cpp} next to this sketch (or add the
// parent directory to the sketchbook libraries) and compile for the Mega.

#include "tension_controller.h"

using knode_hw::AutoTare;
using knode_hw::ClampPwm;
using knode_hw::LoadCellCal;
using knode_hw::TensionController;
using knode_hw::kNumMotors;

struct MotorPins { uint8_t inA, inB, en; };
static const MotorPins kMotors[kNumMotors] = {
    {24, 26, 44}, {4, 5, 6}, {11, 12, 13}, {7, 8, 9}};
static const uint8_t kLoadCellPins[kNumMotors] = {A4, A5, A6, A7};

static LoadCellCal cal[kNumMotors];
static TensionController controller;
static unsigned long previousTime = 0;

static void writeMotor(int i, float speed) {
  // H-bridge drive with direction correction (TensionMotor.cpp:69-87)
  speed = ClampPwm(-speed);  // _directionCorrection = -1
  if (speed < 0) {
    digitalWrite(kMotors[i].inA, LOW);
    digitalWrite(kMotors[i].inB, HIGH);
    analogWrite(kMotors[i].en, (int)(255 * -speed));
  } else if (speed > 0) {
    digitalWrite(kMotors[i].inA, HIGH);
    digitalWrite(kMotors[i].inB, LOW);
    analogWrite(kMotors[i].en, (int)(255 * speed));
  } else {
    digitalWrite(kMotors[i].inA, LOW);
    digitalWrite(kMotors[i].inB, LOW);
    analogWrite(kMotors[i].en, 0);
  }
}

static float readCell(int i) {
  return cal[i].convert((float)analogRead(kLoadCellPins[i]));
}

void setup() {
  Serial.begin(115200);
  delay(1000);
  for (int i = 0; i < kNumMotors; ++i) {
    pinMode(kMotors[i].inA, OUTPUT);
    pinMode(kMotors[i].inB, OUTPUT);
    pinMode(kMotors[i].en, OUTPUT);
    cal[i].set_scale(2.56f);
    // two-phase auto-tare per channel (TensionMotor::tare parity)
    AutoTare tare;
    while (!tare.done()) {
      writeMotor(i, tare.Step(readCell(i)));
      delay(50);
    }
    writeMotor(i, 0);
    cal[i].tare((float)analogRead(kLoadCellPins[i]));
  }
  previousTime = millis();
}

void loop() {
  if (Serial.available() > 0) {
    String input = Serial.readStringUntil('\n');
    controller.ParseLine(input.c_str());
  }

  unsigned long now = millis();
  float dt = (now - previousTime) / 1000.0f;
  previousTime = now;

  float readings[kNumMotors];
  float pwm[kNumMotors];
  for (int i = 0; i < kNumMotors; ++i) readings[i] = readCell(i);
  controller.Step(readings, dt, pwm);
  for (int i = 0; i < kNumMotors; ++i) writeMotor(i, pwm[i]);

  char buf[128];
  if (controller.Telemetry(buf, sizeof(buf))) Serial.println(buf);
  delay(1);
}
